# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""JIT uniform-weight connectivity family
(reference ``brainevent/_jit_uniform/``): per-edge weights drawn
``Uniform(w_low, w_high)`` from the stateless 24-bit edge hash."""

from ..rng.light import light_rng_uniform01
from .family import JITCFamilySpec, make_family
from .classes import make_classes

__all__ = [
    'JITCUniformMatrix', 'JITCUniformR', 'JITCUniformC',
    'jitu', 'jitu_p', 'jitumv', 'jitumv_p', 'jitumm', 'jitumm_p',
    'binary_jitumv', 'binary_jitumv_p', 'binary_jitumm', 'binary_jitumm_p',
    'jitu_csr_count_p', 'jitu_csr_fill_p', 'jitu_to_csr', 'jitumv_dt2t', 'jitumv_dt2t_p',
    'jitumv_plan', 'jitumv_plan_p', 'jitumm_plan', 'jitumm_plan_p',
]


def _uniform_weight(params, seed, rows, cols):
    w_low, w_high = params
    u = light_rng_uniform01(seed, rows, cols)
    return w_low[0] + u * (w_high[0] - w_low[0])


_family = make_family(JITCFamilySpec(
    tag='u',
    name='jit_uniform',
    n_params=2,
    weight_fn=_uniform_weight,
    # probes: (1,0) realizes (1-u) = d/dw_low; (0,1) realizes u = d/dw_high
    param_basis=((1.0, 0.0), (0.0, 1.0)),
))

jitu_p = _family.dense_p
jitumv_p = _family.mv_p
jitumm_p = _family.mm_p
binary_jitumv_p = _family.bmv_p
binary_jitumm_p = _family.bmm_p
jitu_csr_count_p = _family.count_p
jitu_csr_fill_p = _family.fill_p

jitu = _family.dense_fn
jitumv = _family.mv_fn
jitumm = _family.mm_fn
binary_jitumv = _family.bmv_fn
binary_jitumm = _family.bmm_fn
jitu_to_csr = _family.to_csr
jitumv_dt2t = _family.dt2t_fn
jitumv_dt2t_p = _family.dt2t_p
jitumv_plan = _family.plan_mv_fn
jitumv_plan_p = _family.plan_mv_p
jitumm_plan = _family.plan_mm_fn
jitumm_plan_p = _family.plan_mm_p

JITCUniformMatrix, JITCUniformR, JITCUniformC = make_classes(
    _family, 'JITCUniform', ('wlow', 'whigh'))
