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

"""CSR row slicing (reference ``brainevent/_csr/slice.py``).

``csr_slice_rows`` extracts selected rows of a CSR matrix as a **dense**
``(len(rows), n_cols)`` matrix — static output shape, jit/TPU friendly. A
custom gradient primitive (``csr_slice_rows_grad_p``) maps dense cotangents
back onto the selected rows' nse slots.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .._compat import ad
from .._misc import namescope
from ..ops.core import XLACustomKernel
from ..units import maybe_unit, split_mantissa_unit
from ._common import row_ids_from_indptr

__all__ = [
    'csr_slice_rows', 'csr_slice_rows_p', 'csr_slice_rows_p_call',
    'csr_slice_rows_grad', 'csr_slice_rows_grad_p', 'csr_slice_rows_grad_p_call',
]


def _slice_rows_jax_kernel(*, shape, **params):
    n_cols = shape[1]
    nse = params['indices_info'].shape[0]
    homo = params['data_len'] == 1

    def kernel(data, indices, indptr, row_indices):
        rows = row_ids_from_indptr(indptr, nse)
        d = jnp.broadcast_to(data, (nse,)) if homo else data
        # Dense scatter of every nse into its (row, col) cell, then gather
        # the selected rows. Flat cell ids keep this a single 1-D scatter.
        flat = rows.astype(jnp.int32) * n_cols + indices.astype(jnp.int32)
        dense = jnp.zeros(shape[0] * n_cols, dtype=data.dtype
                          ).at[flat].add(d, mode='drop')
        dense = dense.reshape(shape[0], n_cols)
        return (dense[row_indices],)

    return kernel


csr_slice_rows_p = XLACustomKernel(
    'csr_slice_rows',
    doc='Extract selected CSR rows as a dense submatrix '
        '(reference brainevent/_csr/slice.py:39).',
)
csr_slice_rows_p.def_jax_kernel(_slice_rows_jax_kernel, asdefault=True)
csr_slice_rows_p.def_pallas_kernel(lambda **p: _slice_rows_jax_kernel(**p))
csr_slice_rows_p.def_general_batching()
csr_slice_rows_p.def_tags('csr', 'slice')


def csr_slice_rows_p_call(data, indices, indptr, row_indices, *,
                          shape, backend: Optional[str] = None):
    """Low-level slice call; returns ``[(num_selected, n_cols) dense]``."""
    data = jnp.atleast_1d(jnp.asarray(data))
    row_indices = jnp.atleast_1d(jnp.asarray(row_indices))
    num_selected = row_indices.shape[0]
    return csr_slice_rows_p(
        data, indices, indptr, row_indices,
        outs=[jax.ShapeDtypeStruct((num_selected, shape[1]), data.dtype)],
        shape=tuple(shape), backend=backend,
        indices_info=jax.ShapeDtypeStruct(indices.shape, indices.dtype),
        data_len=int(data.shape[0]),
    )


csr_slice_rows_p.def_call(csr_slice_rows_p_call)


def _slice_rows_jvp_data(d_dot, data, indices, indptr, row_indices, **params):
    return csr_slice_rows_p_call(d_dot, indices, indptr, row_indices,
                                 shape=params['shape'],
                                 backend=params.get('backend'))


def _slice_rows_transpose_rule(ct, data, indices, indptr, row_indices, **params):
    assert ad.is_undefined_primal(data)
    ct = ct[0]
    d_bar = csr_slice_rows_grad_p_call(
        ct, indices, indptr, row_indices,
        shape=params['shape'], data_len=params['data_len'],
        backend=params.get('backend'))[0]
    if params['data_len'] == 1:
        d_bar = jnp.sum(d_bar, keepdims=True)
    return d_bar, indices, indptr, row_indices


csr_slice_rows_p.def_jvp_rule2(_slice_rows_jvp_data, None, None, None)
csr_slice_rows_p.def_transpose_rule(_slice_rows_transpose_rule)


@namescope(name='csr_slice_rows', static_argnames=('shape', 'backend'))
def csr_slice_rows(data, indices, indptr, row_indices, *, shape,
                   backend: Optional[str] = None):
    """Dense submatrix of the selected CSR rows (unit-aware)."""
    data, unit = split_mantissa_unit(data)
    (out,) = csr_slice_rows_p_call(data, indices, indptr, row_indices,
                                   shape=shape, backend=backend)
    return maybe_unit(out, unit)


# =============================================================================
# gradient primitive: dense cotangent -> per-nse cotangent of selected rows
# =============================================================================

def _slice_rows_grad_jax_kernel(*, shape, data_len, **params):
    nse = params['indices_info'].shape[0]

    def kernel(ct, indices, indptr, row_indices):
        rows = row_ids_from_indptr(indptr, nse)
        # sel_pos[r] = position of logical row r within row_indices (or -1)
        n_rows = shape[0]
        sel_pos = jnp.full(n_rows, -1, dtype=jnp.int32).at[row_indices].set(
            jnp.arange(row_indices.shape[0], dtype=jnp.int32), mode='drop')
        pos = sel_pos[rows]
        valid = pos >= 0
        vals = ct[jnp.clip(pos, 0), indices]
        return (jnp.where(valid, vals, 0).astype(ct.dtype),)

    return kernel


csr_slice_rows_grad_p = XLACustomKernel(
    'csr_slice_rows_grad',
    doc='Gradient of csr_slice_rows: dense cotangent back to nse slots '
        '(reference brainevent/_csr/slice.py:300).',
)
csr_slice_rows_grad_p.def_jax_kernel(_slice_rows_grad_jax_kernel, asdefault=True)
csr_slice_rows_grad_p.def_pallas_kernel(lambda **p: _slice_rows_grad_jax_kernel(**p))
csr_slice_rows_grad_p.def_general_batching()
csr_slice_rows_grad_p.def_tags('csr', 'slice', 'grad')


def csr_slice_rows_grad_p_call(ct, indices, indptr, row_indices, *,
                               shape, data_len: int = 0,
                               backend: Optional[str] = None):
    """Low-level slice-grad call; returns ``[(nse,) cotangent]``."""
    row_indices = jnp.atleast_1d(jnp.asarray(row_indices))
    return csr_slice_rows_grad_p(
        ct, indices, indptr, row_indices,
        outs=[jax.ShapeDtypeStruct(indices.shape, ct.dtype)],
        shape=tuple(shape), data_len=int(data_len), backend=backend,
        indices_info=jax.ShapeDtypeStruct(indices.shape, indices.dtype),
    )


csr_slice_rows_grad_p.def_call(csr_slice_rows_grad_p_call)


def csr_slice_rows_grad(ct, indices, indptr, row_indices, *, shape,
                        backend: Optional[str] = None):
    """Map a dense slice cotangent back to per-nse values (unit-aware)."""
    ct, unit = split_mantissa_unit(ct)
    (out,) = csr_slice_rows_grad_p_call(ct, indices, indptr, row_indices,
                                        shape=shape, backend=backend)
    return maybe_unit(out, unit)
