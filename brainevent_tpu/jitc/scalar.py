# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""JIT scalar-weight connectivity family
(reference ``brainevent/_jit_scalar/``): every connection shares one weight.
"""

import jax.numpy as jnp

from .family import JITCFamilySpec, make_family
from .classes import make_classes

__all__ = [
    'JITCScalarMatrix', 'JITCScalarR', 'JITCScalarC',
    'jits', 'jits_p', 'jitsmv', 'jitsmv_p', 'jitsmm', 'jitsmm_p',
    'binary_jitsmv', 'binary_jitsmv_p', 'binary_jitsmm', 'binary_jitsmm_p',
    'jits_csr_count_p', 'jits_csr_fill_p', 'jits_to_csr', 'jitsmv_dt2t', 'jitsmv_dt2t_p',
    'jitsmv_plan', 'jitsmv_plan_p', 'jitsmm_plan', 'jitsmm_plan_p',
]


def _scalar_weight(params, seed, rows, cols):
    del seed, cols
    return jnp.broadcast_to(params[0][0], rows.shape)


_family = make_family(JITCFamilySpec(
    tag='s',
    name='jit_scalar',
    n_params=1,
    weight_fn=_scalar_weight,
    param_basis=((1.0,),),
))

jits_p = _family.dense_p
jitsmv_p = _family.mv_p
jitsmm_p = _family.mm_p
binary_jitsmv_p = _family.bmv_p
binary_jitsmm_p = _family.bmm_p
jits_csr_count_p = _family.count_p
jits_csr_fill_p = _family.fill_p

jits = _family.dense_fn
jitsmv = _family.mv_fn
jitsmm = _family.mm_fn
binary_jitsmv = _family.bmv_fn
binary_jitsmm = _family.bmm_fn
jits_to_csr = _family.to_csr
jitsmv_dt2t = _family.dt2t_fn
jitsmv_dt2t_p = _family.dt2t_p
jitsmv_plan = _family.plan_mv_fn
jitsmv_plan_p = _family.plan_mv_p
jitsmm_plan = _family.plan_mm_fn
jitsmm_plan_p = _family.plan_mm_p

JITCScalarMatrix, JITCScalarR, JITCScalarC = make_classes(
    _family, 'JITCScalar', ('weight',))
