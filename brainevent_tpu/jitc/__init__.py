# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Just-in-time connectivity: weights regenerated in-kernel, never stored
(reference ``brainevent/_jit_scalar``, ``_jit_normal``, ``_jit_uniform``)."""

from .classes import JITCModeView, JITCWalkPlan
from .scalar import (
    JITCScalarMatrix, JITCScalarR, JITCScalarC,
    jits, jits_p, jitsmv, jitsmv_p, jitsmm, jitsmm_p,
    binary_jitsmv, binary_jitsmv_p, binary_jitsmm, binary_jitsmm_p,
    jits_csr_count_p, jits_csr_fill_p, jits_to_csr, jitsmv_dt2t, jitsmv_dt2t_p,
    jitsmv_plan, jitsmv_plan_p, jitsmm_plan, jitsmm_plan_p,
)
from .normal import (
    JITCNormalMatrix, JITCNormalR, JITCNormalC,
    jitn, jitn_p, jitnmv, jitnmv_p, jitnmm, jitnmm_p,
    binary_jitnmv, binary_jitnmv_p, binary_jitnmm, binary_jitnmm_p,
    jitn_csr_count_p, jitn_csr_fill_p, jitn_to_csr, jitnmv_dt2t, jitnmv_dt2t_p,
    jitnmv_plan, jitnmv_plan_p, jitnmm_plan, jitnmm_plan_p,
)
from .uniform import (
    JITCUniformMatrix, JITCUniformR, JITCUniformC,
    jitu, jitu_p, jitumv, jitumv_p, jitumm, jitumm_p,
    binary_jitumv, binary_jitumv_p, binary_jitumm, binary_jitumm_p,
    jitu_csr_count_p, jitu_csr_fill_p, jitu_to_csr, jitumv_dt2t, jitumv_dt2t_p,
    jitumv_plan, jitumv_plan_p, jitumm_plan, jitumm_plan_p,
)

__all__ = [
    'JITCModeView', 'JITCWalkPlan',
    'JITCScalarMatrix', 'JITCScalarR', 'JITCScalarC',
    'jits', 'jits_p', 'jitsmv', 'jitsmv_p', 'jitsmm', 'jitsmm_p',
    'binary_jitsmv', 'binary_jitsmv_p', 'binary_jitsmm', 'binary_jitsmm_p',
    'jits_csr_count_p', 'jits_csr_fill_p', 'jits_to_csr', 'jitsmv_dt2t', 'jitsmv_dt2t_p',
    'jitsmv_plan', 'jitsmv_plan_p', 'jitsmm_plan', 'jitsmm_plan_p',
    'JITCNormalMatrix', 'JITCNormalR', 'JITCNormalC',
    'jitn', 'jitn_p', 'jitnmv', 'jitnmv_p', 'jitnmm', 'jitnmm_p',
    'binary_jitnmv', 'binary_jitnmv_p', 'binary_jitnmm', 'binary_jitnmm_p',
    'jitn_csr_count_p', 'jitn_csr_fill_p', 'jitn_to_csr', 'jitnmv_dt2t', 'jitnmv_dt2t_p',
    'jitnmv_plan', 'jitnmv_plan_p', 'jitnmm_plan', 'jitnmm_plan_p',
    'JITCUniformMatrix', 'JITCUniformR', 'JITCUniformC',
    'jitu', 'jitu_p', 'jitumv', 'jitumv_p', 'jitumm', 'jitumm_p',
    'binary_jitumv', 'binary_jitumv_p', 'binary_jitumm', 'binary_jitumm_p',
    'jitu_csr_count_p', 'jitu_csr_fill_p', 'jitu_to_csr', 'jitumv_dt2t', 'jitumv_dt2t_p',
    'jitumv_plan', 'jitumv_plan_p', 'jitumm_plan', 'jitumm_plan_p',
]
