# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Dense weight matrix + event-driven dense products
(reference ``brainevent/_dense/``)."""

from .main import Dense
from .binary import (
    binary_densemv, binary_densemv_p, binary_densemv_p_call,
    binary_densemm, binary_densemm_p, binary_densemm_p_call,
)
from .plasticity import (
    update_dense_on_binary_pre, update_dense_on_binary_pre_p,
    update_dense_on_binary_post, update_dense_on_binary_post_p,
)

__all__ = [
    'Dense',
    'binary_densemv', 'binary_densemv_p', 'binary_densemv_p_call',
    'binary_densemm', 'binary_densemm_p', 'binary_densemm_p_call',
    'update_dense_on_binary_pre', 'update_dense_on_binary_pre_p',
    'update_dense_on_binary_post', 'update_dense_on_binary_post_p',
]
