# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""JIT normal-weight connectivity family
(reference ``brainevent/_jit_normal/``): per-edge weights drawn
``Normal(w_loc, w_scale)`` from the stateless edge hash (Acklam
inverse-CDF of the 24-bit uniform)."""

from ..rng.light import light_rng_normal01
from .family import JITCFamilySpec, make_family
from .classes import make_classes

__all__ = [
    'JITCNormalMatrix', 'JITCNormalR', 'JITCNormalC',
    'jitn', 'jitn_p', 'jitnmv', 'jitnmv_p', 'jitnmm', 'jitnmm_p',
    'binary_jitnmv', 'binary_jitnmv_p', 'binary_jitnmm', 'binary_jitnmm_p',
    'jitn_csr_count_p', 'jitn_csr_fill_p', 'jitn_to_csr', 'jitnmv_dt2t', 'jitnmv_dt2t_p',
    'jitnmv_plan', 'jitnmv_plan_p', 'jitnmm_plan', 'jitnmm_plan_p',
]


def _normal_weight(params, seed, rows, cols):
    w_loc, w_scale = params
    return w_loc[0] + light_rng_normal01(seed, rows, cols) * w_scale[0]


_family = make_family(JITCFamilySpec(
    tag='n',
    name='jit_normal',
    n_params=2,
    weight_fn=_normal_weight,
    param_basis=((1.0, 0.0), (0.0, 1.0)),
))

jitn_p = _family.dense_p
jitnmv_p = _family.mv_p
jitnmm_p = _family.mm_p
binary_jitnmv_p = _family.bmv_p
binary_jitnmm_p = _family.bmm_p
jitn_csr_count_p = _family.count_p
jitn_csr_fill_p = _family.fill_p

jitn = _family.dense_fn
jitnmv = _family.mv_fn
jitnmm = _family.mm_fn
binary_jitnmv = _family.bmv_fn
binary_jitnmm = _family.bmm_fn
jitn_to_csr = _family.to_csr
jitnmv_dt2t = _family.dt2t_fn
jitnmv_dt2t_p = _family.dt2t_p
jitnmv_plan = _family.plan_mv_fn
jitnmv_plan_p = _family.plan_mv_p
jitnmm_plan = _family.plan_mm_fn
jitnmm_plan_p = _family.plan_mm_p

JITCNormalMatrix, JITCNormalR, JITCNormalC = make_classes(
    _family, 'JITCNormal', ('wloc', 'wscale'),
    # adding a scalar shifts the location only
    lift_add=lambda params, s: (params[0] + s, params[1]),
)
