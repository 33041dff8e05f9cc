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

"""CSR diagonal addition (reference ``brainevent/_csr/diag_add.py``)."""

import jax
import jax.numpy as jnp

from .._error import MathError
from ._common import row_ids_from_indptr

__all__ = ['csr_diag_position', 'csr_diag_add']


def csr_diag_position(indptr, indices, *, shape):
    """Locate the nse slot of every diagonal entry.

    Returns an int32 array of length ``min(shape)``: ``positions[i]`` is the
    index into ``data`` holding ``A[i, i]``, or ``-1`` if that diagonal
    element is not stored in the sparsity structure.
    """
    n_diag = min(shape)
    nse = indices.shape[0]
    rows = row_ids_from_indptr(indptr, nse)
    on_diag = (rows == indices.astype(rows.dtype)) & (rows < n_diag)
    slots = jnp.arange(nse, dtype=jnp.int32)
    positions = jnp.full(n_diag, -1, dtype=jnp.int32)
    return positions.at[jnp.where(on_diag, rows.astype(jnp.int32), n_diag)].set(
        slots, mode='drop')


def csr_diag_add(csr_value, positions, diag_value):
    """Add ``diag_value`` onto the stored diagonal slots of ``csr_value``.

    Raises :class:`MathError` at trace time if any needed diagonal entry is
    structurally missing (position ``-1``) — adding to an unstored slot would
    silently change the sparsity pattern.
    """
    csr_value = jnp.asarray(csr_value)
    diag_value = jnp.broadcast_to(jnp.asarray(diag_value), positions.shape)
    import numpy as np
    if not isinstance(positions, jax.core.Tracer):
        missing = np.asarray(positions) < 0
        if missing.any():
            raise MathError(
                f'{int(missing.sum())} diagonal entries are not stored in the '
                f'CSR structure; diag_add cannot change the sparsity pattern. '
                f'First missing row: {int(np.nonzero(missing)[0][0])}.'
            )
    safe = jnp.where(positions >= 0, positions, csr_value.shape[0])
    return csr_value.at[safe].add(
        jnp.where(positions >= 0, diag_value.astype(csr_value.dtype), 0),
        mode='drop')
