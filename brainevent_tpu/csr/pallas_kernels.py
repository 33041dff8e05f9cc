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

"""Real Mosaic kernel for the event-driven CSR gather matvec.

TPU-native counterpart of the reference's warp-per-row CUDA gather kernels
(``/root/reference/brainevent/_csr/binary_csrmv.cu:437-485``). The CSR
structure is hostile to a gather-free machine — rows are ragged and the
output position of every nonzero is data-dependent — so the kernel works
on the FLAT nonzero axis instead of per-row:

1. The wrapper precomputes per-nonzero row ids (one ``searchsorted`` over
   ``indptr``, plain XLA) — sorted by construction.
2. In-kernel, active spike ids are compacted (shared machinery from
   ``fcn/pallas_kernels.py``) and membership hits accumulate with one
   vectorized compare of the whole ``(nnz,)`` index array per active id.
3. The segment reduction ``y[i] = sum_{e in row i} w_e * hit_e`` is a
   stacked one-hot MXU contraction over the row ids.

Cost is ``O(nnz * n_active / VPU)`` for phase 2 and ``O(n * nnz)`` MXU
FLOPs for phase 3, so the kernel is registered behind a size guard
(``n * nnz`` budget) with the XLA formulation as fallback; the
microbenchmark grid decides the crossover per shape class.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode
from ..fcn.pallas_kernels import (_compaction_consts, _position_map,
                                  _compact_ids, _ceil_to)

__all__ = ['csr_event_gather_kernel']

_LANES = 128
_VMEM_BUDGET = 96 * 1024 * 1024
_MXU_FLOP_BUDGET = 4_000_000_000      # n * nnz ceiling for the one-hot path


def csr_event_gather_kernel(*, shape, outs, transpose, cap: int = None, **_):
    """Build the Pallas NT kernel ``y[i] = sum_{seg i} w_e gate(s[idx_e])``.

    Returns ``(weights, indices, indptr, spikes) -> (y,)`` or None when the
    size guard trips (caller falls back to XLA).
    """
    n_rows, n_cols = shape
    if transpose:
        n_rows, n_cols = n_cols, n_rows
    out_dtype = outs[0].dtype

    def call(weights, indices, indptr, spikes):
        if jnp.dtype(out_dtype) == jnp.float64:
            return None          # Mosaic computes f32; keep x64 exact on XLA
        nnz = indices.shape[0]
        if n_rows * nnz > _MXU_FLOP_BUDGET:
            return None
        nnzP = _ceil_to(max(nnz, _LANES), _LANES * 8)
        Re = nnzP // _LANES             # nonzero-axis blocks
        ncolP = _ceil_to(n_cols, _LANES)
        Rc = ncolP // _LANES            # spike-axis blocks
        Ry = _ceil_to(n_rows, _LANES) // _LANES
        homo = weights.shape == (1,)
        A = cap or min(ncolP, max(64, _ceil_to(-(-n_cols // 64), 32)))
        # idx + rowid + hits (+ weights) arrays, factor temporaries, output
        mem = (nnzP * (12 + (0 if homo else 4))
               + Re * (Ry + _LANES) * 4 + (Ry + Rc + A) * _LANES * 4)
        if mem > _VMEM_BUDGET:
            return None

        # per-nonzero row id: row[e] = i  <=>  indptr[i] <= e < indptr[i+1]
        rowid = jnp.searchsorted(indptr[1:], jnp.arange(nnz, dtype=indptr.dtype),
                                 side='right').astype(jnp.int32)

        def kernel(w_ref, idx_ref, rid_ref, spk_ref, y_ref,
                   idscol_ref, hits_ref):
            uppr, idmat = _compaction_consts(Rc)
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, A), 1).astype(jnp.float32)
            gate = (spk_ref[:] != 0).astype(jnp.float32)
            active = gate > 0
            offs, prefix, n_act, maxrow = _position_map(gate, uppr)
            lrounds = (maxrow + 3) // 4
            rounds = (n_act + A - 1) // A
            hits_ref[:] = jnp.zeros_like(hits_ref)

            def one_round(r, _):
                shift = (r * A).astype(jnp.float32)
                ids_row = _compact_ids(active, offs, prefix, idmat,
                                       cap_iota, shift, lrounds)
                idscol_ref[:] = ids_row.T
                cnt_r = jnp.minimum(n_act - r * A, A)

                def member(a, _):
                    sa = idscol_ref[a, 0].astype(jnp.int32) - 1
                    # in-place ref update: value carries spill at scale
                    hits_ref[:] = hits_ref[:] + (idx_ref[:] == sa
                                                 ).astype(jnp.float32)
                    return 0

                jax.lax.fori_loop(0, cnt_r, member, 0)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

            # one-hot segment reduction on the MXU: y = Seg @ vals, built
            # from the sorted row ids. The nonzero axis lives as (Re, 128);
            # iterating the 128 lanes statically gives (Re, 1) columns for
            # the factor builds — total build work nnz*(Ry+128) elements,
            # total contraction FLOPs nnz*Ry*128*2, independent of nnz's
            # layout. Heterogeneous weights ride the lane factor as exact
            # f32 values; homogeneous stay binary (bf16-exact dot).
            blk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, Ry), 1)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
            vals = hits_ref[:] if homo else hits_ref[:] * w_ref[:]
            rid_all = rid_ref[:]
            acc = jnp.zeros((Ry, _LANES), jnp.float32)
            for l in range(_LANES):
                ridc = rid_all[:, l:l + 1]                 # (Re, 1)
                vc = vals[:, l:l + 1]                      # (Re, 1)
                m2 = (ridc // _LANES == blk_iota).astype(jnp.float32)
                m1 = jnp.where(ridc % _LANES == lane_iota, vc, 0.0)
                acc = acc + jax.lax.dot_general(
                    m2, m1, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(None if homo
                               else jax.lax.Precision.HIGHEST))
            if homo:
                acc = acc * w_ref[0, 0]
            y_ref[:] = acc.astype(out_dtype)

        pad_e = lambda x, fill: jnp.pad(
            x, (0, nnzP - nnz), constant_values=fill).reshape(Re, _LANES)
        spk_pad = jnp.pad((spikes > 0) if spikes.dtype != jnp.bool_
                          else spikes,
                          (0, ncolP - n_cols)).reshape(Rc, _LANES)
        if homo:
            w_in = weights.astype(jnp.float32).reshape(1, 1)
        else:
            w_in = pad_e(weights.astype(jnp.float32), 0.0)
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        (y,) = pl.pallas_call(
            kernel,
            in_specs=[vmem()] * 4,
            out_specs=(vmem(),),
            out_shape=(jax.ShapeDtypeStruct((Ry, _LANES), out_dtype),),
            scratch_shapes=[
                pltpu.VMEM((A, 1), jnp.float32),
                pltpu.VMEM((Re, _LANES), jnp.float32),
            ],
            compiler_params=pallas_tpu_params(
                vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
            interpret=interpret_mode(),
        )(w_in, pad_e(indices.astype(jnp.int32), -2),
          pad_e(rowid, n_rows + _LANES), spk_pad)
        return (y.reshape(Ry * _LANES)[:n_rows],)

    return call
