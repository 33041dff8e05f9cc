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

"""Real Mosaic kernels for the event-driven ELL (fixed-number) matvecs.

TPU-native replacements for the reference's hand-tuned CUDA ELL kernels
(``/root/reference/brainevent/_fcn/binary_fcnmv.cu``), built from the
measured Mosaic capability set (BENCH_NOTES.md): no gathers, no dynamic
lane indexing — event compaction plus vectorized compares and MXU one-hot
contractions instead.

- **Gather direction** (``transpose=False``: ``y[i] = sum_k w[i,k] *
  gate(s[idx[i,k]])``): compact the active spike ids to a scalar-readable
  column, then accumulate membership hits with ONE vectorized compare of
  the whole ``(n_pre, K)`` index table per active id. Cost is
  ``O(nnz * n_active / VPU_width)`` with zero serialized per-row work —
  the event-driven formulation the reference reaches with gather hardware,
  reached here without it.
- **Scatter direction** (``transpose=True``): compact active rows, copy
  each active row's targets (one dynamic-sublane row copy per event), and
  contract stacked one-hot factors on the MXU into the compact
  ``(n_post/128, 128)`` output — the standalone-op version of the
  mega-kernel engine (``models/pallas_sim.py``), packed 3 block-rows per
  f32 mantissa for homogeneous weights.

Both directions handle event-count overflow exactly via extra compaction
rounds. Oversized inputs fall back to the XLA formulation (the generator
returns the jax kernel) so ``backend='pallas'`` stays usable at any size.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode

__all__ = ['fcn_event_gather_kernel', 'fcn_event_scatter_kernel']

_LANES = 128
_VMEM_BUDGET = 96 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _compaction_consts(Rc: int):
    """Iotas shared by the two-stage active-id compaction."""
    uppr = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
            ).astype(jnp.float32)
    idmat = (jax.lax.broadcasted_iota(jnp.int32, (Rc, _LANES), 0) * _LANES
             + jax.lax.broadcasted_iota(jnp.int32, (Rc, _LANES), 1)
             + 1).astype(jnp.float32)       # +1: 0 marks empty slots
    return uppr, idmat


_TRI_CHUNK = 512


def _exclusive_block_offsets(rowsum, R: int):
    """Exclusive cumsum of ``rowsum`` (R, 1) via chunked strict-triangular
    matmuls with a scalar carry — O(R * 512) FLOPs and O(512^2) VMEM
    instead of the O(R^2) single-triangle form, which costs 39 MB of mask
    alone at R ~ 3k (400k neurons)."""
    if R <= _TRI_CHUNK:
        tril = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
                > jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
                ).astype(jnp.float32)
        return jax.lax.dot_general(
            tril, rowsum, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    parts = []
    carry = jnp.zeros((1, 1), jnp.float32)
    for c0 in range(0, R, _TRI_CHUNK):
        h = min(_TRI_CHUNK, R - c0)
        rs_c = rowsum[c0:c0 + h]
        tril_c = (jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
                  > jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
                  ).astype(jnp.float32)
        offs_c = jax.lax.dot_general(
            tril_c, rs_c, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + carry
        parts.append(offs_c)
        carry = carry + jnp.sum(rs_c).reshape(1, 1)
    return jnp.concatenate(parts, axis=0)


def _position_map(gate, uppr):
    """Prefix-sum slot assignment for every active lane (exact f32 sums)."""
    rowsum = jnp.sum(gate, axis=1, keepdims=True)
    offs = _exclusive_block_offsets(rowsum, gate.shape[0])
    prefix = jax.lax.dot_general(
        gate, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    n_act = jnp.sum(gate).astype(jnp.int32)
    maxrow = jnp.max(rowsum).astype(jnp.int32)
    return offs, prefix, n_act, maxrow


def _compact_ids(active, offs, prefix, idmat, cap_iota, shift, lrounds,
                 J: int = 4):
    """Two-stage id compaction: returns a ``(1, cap)`` row of (id+1) for
    global slots ``[shift, shift+cap)`` (0 in empty slots)."""
    cap = cap_iota.shape[1]

    def lpass(lr, ids_row):
        for j in range(J):
            rank = (lr * J + j).astype(jnp.float32)
            hit = (prefix == rank) & active
            blkid = jnp.sum(jnp.where(hit, idmat, 0.0),
                            axis=1, keepdims=True)
            take = (offs + rank - shift) == cap_iota
            ids_row = ids_row + jnp.sum(jnp.where(take, blkid, 0.0),
                                        axis=0, keepdims=True)
        return ids_row

    return jax.lax.fori_loop(0, lrounds, lpass,
                             jnp.zeros((1, cap), jnp.float32))


# =============================================================================
# gather direction (transpose=False)
# =============================================================================

def fcn_event_gather_kernel(*, shape, outs, cap: int = None, **_):
    """Build the Pallas NT kernel: ``y[i] = sum_k w[i,k] gate(s[idx[i,k]])``.

    Returns a callable ``(weights, indices, spikes) -> (y,)``.
    """
    n_pre, n_post = shape
    out_dtype = outs[0].dtype

    def call(weights, indices, spikes):
        if jnp.dtype(out_dtype) == jnp.float64:
            return None          # Mosaic computes f32; keep x64 exact on XLA
        K = indices.shape[1]
        Kp = _ceil_to(K, _LANES)
        # the pre axis is GRID-CHUNKED: per-program VMEM holds one
        # (chunk, Kp) slab of the table + accumulator, so n_pre is
        # unbounded (10M-synapse nets included); the spike vector and the
        # compaction machinery are shared by every program (compaction is
        # recomputed per chunk — cheap relative to the compares).
        chunk = max(8, min(_ceil_to(n_pre, 8),
                           _ceil_to(8 * 1024 * 1024 // (Kp * 8), 8)))
        npreP = _ceil_to(n_pre, chunk)
        n_chunks = npreP // chunk
        npostP = _ceil_to(n_post, _LANES)
        Rc = npostP // _LANES
        A = cap or min(npostP, max(64, _ceil_to(-(-n_post // 64), 32)))
        homo = weights.shape == (1,)
        mem = (chunk * Kp * 8            # idx + hit accumulator (per slab)
               + (4 if homo else chunk * Kp * 4)
               + npostP * 4 + Rc * Rc * 4 + Rc * _LANES * 12)
        if mem > _VMEM_BUDGET:
            return None                  # caller falls back to XLA

        def kernel(w_ref, idx_ref, spk_ref, y_ref, idscol_ref, acc_ref):
            uppr, idmat = _compaction_consts(Rc)
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, A), 1).astype(jnp.float32)
            gate = (spk_ref[:] != 0).astype(jnp.float32)
            active = gate > 0
            offs, prefix, n_act, maxrow = _position_map(gate, uppr)
            lrounds = (maxrow + 3) // 4
            rounds = (n_act + A - 1) // A
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def one_round(r, _):
                shift = (r * A).astype(jnp.float32)
                ids_row = _compact_ids(active, offs, prefix, idmat,
                                       cap_iota, shift, lrounds)
                idscol_ref[:] = ids_row.T
                cnt_r = jnp.minimum(n_act - r * A, A)

                def member(a, _):
                    sa = idscol_ref[a, 0].astype(jnp.int32) - 1
                    # in-place ref update: carrying the (npreP, Kp) value
                    # through the loop made Mosaic spill ~100 MB at 40k
                    acc_ref[:] = acc_ref[:] + (idx_ref[:] == sa
                                               ).astype(jnp.float32)
                    return 0

                # bound the compare loop by the live count, not the cap
                jax.lax.fori_loop(0, cnt_r, member, 0)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)
            hits = acc_ref[:]
            if homo:
                y_ref[:] = (w_ref[0, 0]
                            * jnp.sum(hits, axis=1, keepdims=True)
                            ).astype(out_dtype)
            else:
                y_ref[:] = jnp.sum(w_ref[:] * hits, axis=1,
                                   keepdims=True).astype(out_dtype)

        idx_pad = jnp.pad(indices.astype(jnp.int32),
                          ((0, npreP - n_pre), (0, Kp - K)),
                          constant_values=-2)
        spk_pad = jnp.pad((spikes > 0) if spikes.dtype != jnp.bool_
                          else spikes,
                          (0, npostP - n_post)).reshape(Rc, _LANES)
        if homo:
            w_in = weights.astype(jnp.float32).reshape(1, 1)
            w_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            w_in = jnp.pad(weights.astype(jnp.float32),
                           ((0, npreP - n_pre), (0, Kp - K)))
            w_spec = pl.BlockSpec((chunk, Kp), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        (y,) = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                w_spec,
                pl.BlockSpec((chunk, Kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rc, _LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),),
            out_shape=(jax.ShapeDtypeStruct((npreP, 1), out_dtype),),
            scratch_shapes=[
                pltpu.VMEM((A, 1), jnp.float32),
                pltpu.VMEM((chunk, Kp), jnp.float32),
            ],
            compiler_params=pallas_tpu_params(
                vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
            interpret=interpret_mode(),
        )(w_in, idx_pad, spk_pad)
        return (y.reshape(npreP)[:n_pre],)

    return call


# =============================================================================
# scatter direction (transpose=True)
# =============================================================================

def fcn_event_scatter_kernel(*, shape, outs, cap: int = None,
                             pack: bool = False, **_):
    """Build the Pallas T kernel: ``y[idx[i,k]] += w[i,k]`` for active ``i``.

    Compaction + per-event row gather + stacked one-hot MXU contraction.
    ``pack=True`` packs 3 block-rows per f32 mantissa field (homogeneous
    weights only) — exact only while per-target hits per call stay < 256,
    which a single-shot op cannot verify from runtime indices, so callers
    that know their table's in-degree (e.g. the FixedNumConn classes)
    must opt in. Returns ``(weights, indices, spikes) -> (y,)``.
    """
    n_pre, n_post = shape
    out_dtype = outs[0].dtype

    def call(weights, indices, spikes):
        if jnp.dtype(out_dtype) == jnp.float64:
            return None          # Mosaic computes f32; keep x64 exact on XLA
        K = indices.shape[1]
        npreP = _ceil_to(n_pre, _LANES)
        Kp = _ceil_to(K, _LANES)
        npostP = _ceil_to(n_post, _LANES)
        Rc = npreP // _LANES            # compaction runs over PRE ids
        Rp = npostP // _LANES
        homo = weights.shape == (1,)
        use_pack = pack and homo
        A = cap or min(npreP, max(64, _ceil_to(-(-n_pre // 64), 32)))
        kg = max(1, min(K, 4096 // max(A, 1)))
        W2 = (-(-Rp // 3) if use_pack else Rp)
        mem = (npreP * Kp * 4 * (1 if homo else 2)    # idx (+w) tables
               + A * Kp * 4 * (1 if homo else 2)      # gathered rows
               + (A * kg) * (W2 + _LANES) * 4         # factor temporaries
               + W2 * _LANES * 4 + npreP * 4)
        if mem > _VMEM_BUDGET:
            return None

        def kernel(w_ref, idx_ref, spk_ref, y_ref,
                   idscol_ref, rowbuf_ref, wbuf_ref, incp_ref):
            uppr, idmat = _compaction_consts(Rc)
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, A), 1).astype(jnp.float32)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
            w2iota = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
            ecol = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
            gate = (spk_ref[:] != 0).astype(jnp.float32)
            active = gate > 0
            offs, prefix, n_act, maxrow = _position_map(gate, uppr)
            lrounds = (maxrow + 3) // 4
            rounds = (n_act + A - 1) // A
            incp_ref[:] = jnp.zeros_like(incp_ref)

            def one_round(r, _):
                shift = (r * A).astype(jnp.float32)
                ids_row = _compact_ids(active, offs, prefix, idmat,
                                       cap_iota, shift, lrounds)
                idscol_ref[:] = ids_row.T
                cnt_r = jnp.minimum(n_act - r * A, A)

                def gather(g, _):
                    for j in range(8):
                        e = 8 * g + j
                        nid = jnp.maximum(
                            idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                        rowbuf_ref[pl.ds(e, 1), :] = \
                            idx_ref[pl.ds(nid, 1), :]
                        if not homo:
                            wbuf_ref[pl.ds(e, 1), :] = \
                                w_ref[pl.ds(nid, 1), :]
                    return 0

                jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                valid = ecol < cnt_r
                for k0 in range(0, K, kg):
                    kw = min(kg, K - k0)
                    m2s, m1s = [], []
                    for k in range(k0, k0 + kw):
                        tgt = rowbuf_ref[:, k:k + 1]
                        hi = tgt // _LANES
                        if use_pack:
                            col = hi % W2
                            f = hi // W2
                            val = jnp.where(
                                valid,
                                jnp.where(f == 0, 1.0,
                                          jnp.where(f == 1, 256.0,
                                                    65536.0)),
                                0.0)
                        else:
                            col = hi
                            if homo:
                                val = jnp.where(valid, 1.0, 0.0)
                            else:
                                val = jnp.where(valid, wbuf_ref[:, k:k + 1],
                                                0.0)
                        m2s.append((col == w2iota).astype(jnp.float32)
                                   * val)
                        m1s.append((tgt % _LANES == lane128
                                    ).astype(jnp.float32))
                    prec = (None if use_pack or homo
                            else jax.lax.Precision.HIGHEST)
                    incp_ref[:] = incp_ref[:] + jax.lax.dot_general(
                        jnp.concatenate(m2s, axis=0),
                        jnp.concatenate(m1s, axis=0),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

            x = incp_ref[:]
            if use_pack:
                f2 = jnp.floor(x * (1.0 / 65536.0))
                rem = x - f2 * 65536.0
                f1 = jnp.floor(rem * (1.0 / 256.0))
                f0 = rem - f1 * 256.0
                x = jnp.concatenate([f0, f1, f2], axis=0)[0:Rp]
            if homo:
                x = x * w_ref[0, 0]
            y_ref[:] = x.astype(out_dtype)

        idx_pad = jnp.pad(indices.astype(jnp.int32),
                          ((0, npreP - n_pre), (0, Kp - K)))
        spk_pad = jnp.pad((spikes > 0) if spikes.dtype != jnp.bool_
                          else spikes,
                          (0, npreP - n_pre)).reshape(Rc, _LANES)
        if homo:
            w_in = weights.astype(jnp.float32).reshape(1, 1)
        else:
            w_in = jnp.pad(weights.astype(jnp.float32),
                           ((0, npreP - n_pre), (0, Kp - K)))
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        (y,) = pl.pallas_call(
            kernel,
            in_specs=[vmem()] * 3,
            out_specs=(vmem(),),
            out_shape=(jax.ShapeDtypeStruct((Rp, _LANES), out_dtype),),
            scratch_shapes=[
                pltpu.VMEM((A, 1), jnp.float32),
                pltpu.VMEM((A, Kp), jnp.int32),
                pltpu.VMEM((A, Kp) if not homo else (8, _LANES),
                           jnp.float32),
                pltpu.VMEM((W2, _LANES), jnp.float32),
            ],
            compiler_params=pallas_tpu_params(
                vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024),
            interpret=interpret_mode(),
        )(w_in, idx_pad, spk_pad)
        return (y.reshape(npostP)[:n_post],)

    return call
