# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Fixed-number connectivity (ELL) package (reference ``brainevent/_fcn/``)."""

from .main import FixedNumConn, FixedNumPerPre, FixedNumPerPost
from .binary import (
    binary_fcnmv, binary_fcnmv_p, binary_fcnmv_p_call,
    binary_fcnmm, binary_fcnmm_p, binary_fcnmm_p_call,
)
from .float import (
    fcnmv, fcnmv_p, fcnmv_p_call,
    fcnmm, fcnmm_p, fcnmm_p_call,
    fcnmv_dt2t, fcnmm_dt2t,
)
from .plasticity import (
    fcn_plasticity_row_p, fcn_plasticity_row_prim_call,
    update_fixed_post_conn_on_binary_pre,
    update_fixed_pre_conn_on_binary_post,
)

__all__ = [
    'FixedNumConn', 'FixedNumPerPre', 'FixedNumPerPost',
    'binary_fcnmv', 'binary_fcnmv_p',
    'binary_fcnmm', 'binary_fcnmm_p',
    'fcnmv', 'fcnmm', 'fcnmv_dt2t', 'fcnmm_dt2t',
    'fcnmv_p', 'fcnmm_p',
    'fcn_plasticity_row_p',
    'update_fixed_post_conn_on_binary_pre',
    'update_fixed_pre_conn_on_binary_post',
]
