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

"""Sharded event-driven operators over an ICI device mesh.

Op-level multi-chip wrappers (TPU-native extension; the reference is
single-GPU, SURVEY §2.9). The sharding recipe for event SpMV follows the
"How to Scale Your Model" playbook: pick a mesh, shard the synapse tables by
presynaptic rows aligned with the spike vector, compute full-length local
partials (scatter direction needs no communication — targets land anywhere),
and reduce with one collective:

- ``reduce='psum'``         -> replicated output (one ``psum``)
- ``reduce='psum_scatter'`` -> row-sharded output (one reduce-scatter,
  the minimal-traffic choice when the consumer is also sharded)
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ['sharded_binary_fcnmv', 'sharded_binary_csrmv']


def _reduce(partial_out, axis, reduce):
    if reduce == 'psum':
        return jax.lax.psum(partial_out, axis)
    if reduce == 'psum_scatter':
        return jax.lax.psum_scatter(partial_out, axis,
                                    scatter_dimension=0, tiled=True)
    raise ValueError(f"reduce must be 'psum' or 'psum_scatter', got {reduce!r}")


def sharded_binary_fcnmv(weights, indices, spikes, *, mesh: Mesh,
                         shape, axis: Optional[str] = None,
                         reduce: str = 'psum'):
    """Multi-chip event ELL scatter product ``y = W.T @ s``.

    ``indices``/``spikes`` (and heterogeneous ``weights``) are sharded by
    presynaptic rows over *mesh*; each device scatters its local events into
    a full-length partial, reduced with one collective. Equivalent to
    ``binary_fcnmv(..., transpose=True)`` single-chip.
    """
    from ..fcn.binary import _compact_scatter
    axis = axis or mesh.axis_names[0]
    n_pre, n_post = shape
    weights = jnp.atleast_1d(jnp.asarray(weights))
    homo = weights.ndim == 1 and weights.shape[0] == 1

    w_spec = P() if homo else P(axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(w_spec, P(axis), P(axis)),
             out_specs=(P() if reduce == 'psum' else P(axis)),
             check_vma=False)
    def run(w, idx, spk):
        part = _compact_scatter(w, idx, spk, n_post, w.dtype)
        return _reduce(part, axis, reduce)

    return run(weights, jnp.asarray(indices), spikes)


def sharded_binary_csrmv(weights, indices, indptr, spikes, *, mesh: Mesh,
                         shape, axis: Optional[str] = None,
                         reduce: str = 'psum'):
    """Multi-chip event CSR transpose product ``y = A.T @ s``.

    Rows of the CSR matrix (and the spike vector) are sharded over *mesh*;
    requires ``shape[0]`` and ``nse`` divisible by the mesh size with
    row-aligned nse partitions (i.e. ``indptr`` must split evenly — use a
    padded/blocked CSR for arbitrary structures). Each device scatters its
    local rows' events and one collective reduces.
    """
    from ..ops.scatter import event_scatter_add
    axis = axis or mesh.axis_names[0]
    m, k = shape
    n_dev = mesh.devices.size
    weights = jnp.atleast_1d(jnp.asarray(weights))
    homo = weights.shape[0] == 1
    nse = indices.shape[0]
    if m % n_dev or nse % n_dev:
        raise ValueError(
            f'sharded_binary_csrmv needs rows ({m}) and nse ({nse}) divisible '
            f'by the mesh size ({n_dev}); pad the CSR structure.')
    rows_loc = m // n_dev
    nse_loc = nse // n_dev

    # per-device local row pointers (offsets rebased inside shard_map)
    w_spec = P() if homo else P(axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(w_spec, P(axis), P(axis), P(axis)),
             out_specs=(P() if reduce == 'psum' else P(axis)),
             check_vma=False)
    def run(w, idx, local_counts, spk):
        rows_local = jnp.repeat(
            jnp.arange(rows_loc, dtype=jnp.int32), local_counts,
            total_repeat_length=nse_loc)
        gate = (spk.astype(w.dtype) if spk.dtype == jnp.bool_
                else (spk > 0).astype(w.dtype))
        vals = (w[0] if homo else w) * gate[rows_local]
        part = event_scatter_add(idx, vals, k, dtype=w.dtype)
        return _reduce(part, axis, reduce)

    counts = jnp.diff(indptr).astype(jnp.int32)
    return run(weights, jnp.asarray(indices), counts, spikes)
