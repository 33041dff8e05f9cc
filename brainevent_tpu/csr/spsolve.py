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

"""Sparse linear solve for CSR matrices
(reference ``brainevent/_csr/spsolve.py:26``).

The reference delegates to ``jax.experimental.sparse.linalg.spsolve``
(cuSolver QR) — a CUDA-only path. On TPU/CPU there is no sparse direct
solver in XLA, so this falls back to a dense solve; for the moderate systems
SNN models solve (conductance matrices), a dense ``jnp.linalg.solve`` on the
MXU is fast and robust.
"""

import jax
import jax.numpy as jnp

from ._common import row_ids_from_indptr

__all__ = ['csr_solve']


def csr_solve(data, indices, indptr, b, tol=1e-6, reorder=1):
    """Solve ``A x = b`` with ``A`` in CSR form.

    On CUDA backends uses ``jax.experimental.sparse.linalg.spsolve``; on
    CPU/TPU densifies and solves with ``jnp.linalg.solve``.
    """
    data = jnp.atleast_1d(jnp.asarray(data))
    n = indptr.shape[0] - 1
    if jax.default_backend() == 'gpu':  # pragma: no cover - CUDA only
        from jax.experimental.sparse.linalg import spsolve as _spsolve
        return _spsolve(data, indices, indptr, b, tol=tol, reorder=reorder)
    nse = indices.shape[0]
    rows = row_ids_from_indptr(indptr, nse)
    d = jnp.broadcast_to(data, (nse,)) if data.shape[0] == 1 else data
    dense = jnp.zeros((n, n), dtype=d.dtype).at[rows, indices].add(d)
    return jnp.linalg.solve(dense, b)
