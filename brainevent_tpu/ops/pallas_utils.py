# Copyright 2026 The brainevent-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
# ==============================================================================

"""Shared helpers for Pallas-TPU kernels.

Replaces the reference's SIMT launch-config heuristics
(``brainevent/_op/numba_cuda_ffi.py:296``, thread/warp/block-per-row
auto-selection in ``brainevent/_csr/binary_csrmv.cu:437-485``) with TPU tile
heuristics: block shapes aligned to the VPU (8x128) / MXU (128x128) and a
single switch for interpreter-mode execution on non-TPU platforms.
"""

from typing import Optional

import jax.numpy as jnp

from .. import config

__all__ = [
    'interpret_mode',
    'lane_dim',
    'sublane_dim',
    'round_up',
    'block_rows_for',
    'cdiv',
]

# TPU register/tile geometry.
LANES = 128          # last-dim tile width, all dtypes
SUBLANES_F32 = 8     # second-to-last-dim minimum for float32
SUBLANES_BF16 = 16
SUBLANES_I8 = 32


def interpret_mode(platform: Optional[str] = None) -> bool:
    """Whether ``pallas_call`` should run in interpreter mode.

    Honors the global override (:func:`brainevent_tpu.config.set_pallas_interpret`),
    else interprets on every platform except TPU. This is how the whole TPU
    kernel suite executes on CPU-only CI.
    """
    forced = config.get_pallas_interpret()
    if forced is not None:
        return forced
    if platform is None:
        from .._compat import default_platform
        platform = default_platform()
    return platform != 'tpu'


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference ``brainevent/_misc.py:585``)."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round *x* up to a multiple of *m*."""
    return ((x + m - 1) // m) * m


def lane_dim(n: int) -> int:
    """Pad a trailing dimension up to the 128-lane tile width."""
    return max(LANES, round_up(n, LANES))


def sublane_dim(n: int, dtype=jnp.float32) -> int:
    """Pad a second-to-last dimension to the dtype's sublane multiple."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize >= 4:
        m = SUBLANES_F32
    elif dtype.itemsize == 2:
        m = SUBLANES_BF16
    else:
        m = SUBLANES_I8
    return max(m, round_up(n, m))


def block_rows_for(n_rows: int, row_bytes: int, vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Pick a row-block size so one block fits the VMEM budget.

    This is the TPU analogue of the reference's ``generate_block_dim``
    (``brainevent/_misc.py:635``): blocks are multiples of 8 sublanes, at
    least 8, at most the padded row count.
    """
    if row_bytes <= 0:
        return sublane_dim(n_rows)
    rows = vmem_budget // max(1, row_bytes)
    rows = max(SUBLANES_F32, min(rows, n_rows))
    return sublane_dim(min(rows, 1024))
