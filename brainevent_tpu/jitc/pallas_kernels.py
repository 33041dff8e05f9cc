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

"""Mosaic kernels for the implicit-connectivity (JITC) mat-vec products.

The XLA walk engine (:mod:`brainevent_tpu.jitc.engine`) is gather-bound:
every ``while_loop`` round gathers ``v[cols]`` at ~14 ns/element on TPU
(BENCH_PRIMS_r02.json: 3.6-6.5 ms at (1k,1k,10%)).  These kernels remove
the gathers entirely with a **lockstep slot scan**:

- The stream layout is the data contract (reference
  ``brainevent/_misc.py:37-38,74`` — ``(row, chunk, lane)`` streams,
  ``stride=32`` in mv mode): stream ``(r, ch, l)`` only ever visits the
  column slots ``ch*chunk_size + 32*q + l`` for its strictly-increasing
  ``q`` sequence, so ``q < q_slots = ceil(chunk_size/32)`` bounds the
  whole walk **statically**.
- The kernel iterates ``s = 0..q_slots-1``; at each ``s`` the streams
  whose current ``q == s`` contribute (``v`` is pre-arranged so slot
  ``s`` is VMEM sublane ``s`` — a dynamic-sublane row read, which Mosaic
  supports) and advance by one geometric skip.  Each stream performs
  exactly the same draws in the same order as the XLA engine, so the
  sampled matrix is identical by construction — only the f32 summation
  order differs.
- ``walk_setup`` (the rejection-sampled stationary initial ``q``) runs
  *outside* the kernel in XLA: it is vectorized, gather-free, and its
  data-dependent rejection loop has no static bound.

Cost: ~40-80 VPU element-ops per (stream, slot) visit — ``M x N`` visits
total, independent of sparsity (the scan visits every slot once).  This
wins against the gather-bound engine everywhere the implicit family is
actually used (weights regenerated because the matrix is large), and
against dense MXU matmul whenever the weight law is cheaper than the
HBM traffic a materialized matrix would need.

Reference semantics: ``brainevent/_jit_normal/float.py:729-820`` (numba),
``float_jitnmv.cu`` (CUDA) — both enumerate per-stream geometric skips;
this kernel is the same walk re-ordered column-major.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from .._misc import _MM_STRIDE, _MV_STRIDE, _normalize_chunk_size
from ..ops.pallas_utils import interpret_mode
from ..rng.light import light_rng_bounded, light_rng_next
from . import engine

__all__ = ['jitc_matvec_pallas', 'jitc_matmat_pallas', 'jitc_todense_pallas',
           'jitc_matvec_pallas_mm', 'jitc_matmat_pallas_mm',
           'jitc_todense_pallas_mm', 'walk_plan_setup', 'walk_plan_setup_mm']

_U = jnp.uint32
_LANES = 128
_BR = 256                     # walk rows per grid program
_VMEM_LIMIT = 96 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _slot_layout(n_cols: int, chunk_size: int) -> Tuple[int, int]:
    """(q_slots, n_chunks) of the walk over ``n_cols`` columns."""
    n_chunks = -(-n_cols // chunk_size)
    q_slots = -(-chunk_size // _MV_STRIDE)
    return q_slots, n_chunks


def _tile_cols(n_cols: int, chunk_size: int, q_slots: int, n_chunks: int,
               x: jax.Array) -> jax.Array:
    """Arrange ``x (n_cols,)`` as the ``(q_slots, n_chunks*32)`` slot tile:
    ``tile[s, ch*32+l] = x[ch*chunk_size + 32*s + l]`` (0 past the end)."""
    per_chunk = q_slots * _MV_STRIDE
    # chunk ch occupies [ch*chunk_size, ch*chunk_size+chunk_width); copy
    # each chunk into its padded per_chunk frame
    frames = []
    for ch in range(n_chunks):
        lo = ch * chunk_size
        width = min(chunk_size, n_cols - lo)
        frames.append(jnp.zeros((per_chunk,), x.dtype).at[:width].set(
            x[lo:lo + width]))
    xp = jnp.stack(frames)                      # (n_chunks, per_chunk)
    tile = xp.reshape(n_chunks, q_slots, _MV_STRIDE)
    return tile.transpose(1, 0, 2).reshape(q_slots, n_chunks * _MV_STRIDE)


def _untile_cols(n_cols: int, chunk_size: int, q_slots: int, n_chunks: int,
                 tile: jax.Array) -> jax.Array:
    """Inverse of :func:`_tile_cols` (sum-preserving de-layout)."""
    per_chunk = q_slots * _MV_STRIDE
    x3 = tile.reshape(q_slots, n_chunks, _MV_STRIDE).transpose(1, 0, 2)
    flat = x3.reshape(n_chunks * per_chunk)
    parts = []
    for ch in range(n_chunks):
        width = min(chunk_size, n_cols - ch * chunk_size)
        parts.append(jax.lax.dynamic_slice(flat, (ch * per_chunk,), (width,)))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def walk_plan_setup(seed, clen, n_rows: int, n_cols: int,
                    chunk_size: int):
    """Precompute the stream setup consumed by the slot-scan kernels.

    Returns ``(state2 (n_rows, L) u32, q2 (n_rows, L) u32, cl () u32)``
    for the stride-32 mv-mode walk. This is the expensive part of every
    implicit product: the stationary initial ``q`` is drawn by vectorized
    rejection over ALL streams (measured v5e, (2000, 2000): 836 us of the
    991 us jitnmv call — 84%). The result depends only on
    ``(seed, clen, n_rows, n_cols, chunk_size)``, so a matrix whose seed
    and shape are fixed can compute it ONCE and reuse it across calls —
    the walk-plan route (:meth:`~brainevent_tpu.jitc` classes'
    ``build_walk_plan``). The reference re-draws per call inside SIMT
    threads where rejection divergence is cheap
    (``brainevent/_jit_normal/float.py:729``); on the TPU the lockstep
    rejection is a real cost, so the plan hoists it — the same
    structure-binding move as ``CSR.build_mxu_plan()``.
    """
    q_slots, n_chunks = _slot_layout(n_cols, chunk_size)
    L = n_chunks * _MV_STRIDE
    _, _, _, state, q, cl = engine.walk_setup(
        seed, clen, n_rows, n_cols, _MV_STRIDE, chunk_size)
    return state.reshape(n_rows, L), q.reshape(n_rows, L), cl


def _make_kernel(weight_fn, npar: int, q_slots: int, L: int,
                 chunk_size: int, corder: bool):
    """Build the kernel body.  ``L`` = stream lanes (n_chunks*32)."""

    def kernel(scal_ref, par_ref, state_ref, q_ref, x_ref, out_ref):
        pid = pl.program_id(0)
        seed = scal_ref[0, 0]
        cl = scal_ref[0, 1]
        params = [[par_ref[0, i]] for i in range(npar)]

        rows = (jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 0)
                + (pid * _BR).astype(jnp.uint32))
        # col of lane at slot s: base + 32*s
        lane = jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 1)
        base_cols = ((lane // _U(_MV_STRIDE)) * _U(chunk_size)
                     + lane % _U(_MV_STRIDE))

        if not corder:
            @pl.when(pid == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        def body(s, carry):
            state, q, acc = carry
            su = s.astype(jnp.uint32)
            hit = q == su
            cols = base_cols + _U(_MV_STRIDE) * su
            w = weight_fn(params, seed, rows, cols).astype(jnp.float32)
            if corder:
                vrow = x_ref[pl.ds(s, 1), :]              # (1, L)
                acc = acc + jnp.where(hit, w * vrow, 0.0)
            else:
                contrib = jnp.where(hit, w, 0.0) * x_ref[:]   # (BR, L)
                out_ref[pl.ds(s, 1), :] = (
                    out_ref[pl.ds(s, 1), :]
                    + jnp.sum(contrib, axis=0, keepdims=True))
            nxt = light_rng_next(state)
            q2 = q + _U(1) + light_rng_bounded(nxt, cl - _U(1))
            state = jnp.where(hit, nxt, state)
            q = jnp.where(hit, q2, q)
            return state, q, acc

        state0 = state_ref[:]
        q0 = q_ref[:]
        acc0 = jnp.zeros((_BR, L if corder else 1), jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, q_slots, body, (state0, q0, acc0))
        if corder:
            out_ref[:] = jnp.sum(acc, axis=1, keepdims=True)

    return kernel


def _make_mm_kernel(weight_fn, npar: int, q_slots: int, L: int,
                    chunk_size: int, corder: bool, nb: int):
    """Batched slot scan: one walk (one RNG stream set) feeds ``nb``
    operand columns — the per-visit RNG cost is amortized ``nb``-fold
    over the mv kernel run per column.

    Batch columns are stacked on the SUBLANE axis (``x``/``out`` tiles
    are ``(nb*q_slots, L)``, batch ``b`` owning sublanes
    ``[b*q_slots, (b+1)*q_slots)``): every dynamic access is then a
    full-lane row at lane offset 0, the one dynamic-index form Mosaic
    supports — a lane-offset slice at a dynamic sublane
    (``x[pl.ds(s,1), b*L:(b+1)*L]``) fails remote-compile with
    "dynamic load with unaligned indices" (measured v5e, (2000, 2000),
    B=8)."""

    def kernel(scal_ref, par_ref, state_ref, q_ref, x_ref, out_ref):
        pid = pl.program_id(0)
        seed = scal_ref[0, 0]
        cl = scal_ref[0, 1]
        params = [[par_ref[0, i]] for i in range(npar)]

        rows = (jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 0)
                + (pid * _BR).astype(jnp.uint32))
        lane = jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 1)
        base_cols = ((lane // _U(_MV_STRIDE)) * _U(chunk_size)
                     + lane % _U(_MV_STRIDE))

        if not corder:
            @pl.when(pid == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        def body(s, carry):
            state, q, acc = carry
            su = s.astype(jnp.uint32)
            hit = q == su
            cols = base_cols + _U(_MV_STRIDE) * su
            w = weight_fn(params, seed, rows, cols).astype(jnp.float32)
            masked = jnp.where(hit, w, 0.0)                   # (BR, L)
            if corder:
                accs = []
                for b in range(nb):
                    vrow = x_ref[pl.ds(b * q_slots + s, 1), :]    # (1, L)
                    accs.append(acc[:, b * L:(b + 1) * L] + masked * vrow)
                acc = jnp.concatenate(accs, axis=1)
            else:
                for b in range(nb):
                    xcol = x_ref[:, b:b + 1]                  # (BR, 1)
                    row = pl.ds(b * q_slots + s, 1)
                    out_ref[row, :] = (
                        out_ref[row, :]
                        + jnp.sum(masked * xcol, axis=0, keepdims=True))
            nxt = light_rng_next(state)
            q2 = q + _U(1) + light_rng_bounded(nxt, cl - _U(1))
            state = jnp.where(hit, nxt, state)
            q = jnp.where(hit, q2, q)
            return state, q, acc

        state0 = state_ref[:]
        q0 = q_ref[:]
        acc0 = jnp.zeros((_BR, nb * L if corder else 1), jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, q_slots, body, (state0, q0, acc0))
        if corder:
            outs = [jnp.sum(acc[:, b * L:(b + 1) * L], axis=1,
                            keepdims=True) for b in range(nb)]
            out_ref[:] = (outs[0] if nb == 1
                          else jnp.concatenate(outs, axis=1))

    return kernel


def jitc_matmat_pallas(weight_fn_raw, npar: int, params, seed, clen, B,
                       out_len: int, *, corder: bool, logical_cols: int,
                       event: bool = False, out_dtype=jnp.float32,
                       platform=None, nb_chunk: int = 8, setup=None):
    """Implicit mat-mat on the batched slot-scan Mosaic kernel.

    Same walk/layout contract as :func:`jitc_matvec_pallas` (stride-32
    ``matrix_mode='mv'`` streams — the layout the JITC classes' ``@``
    route uses); the operand batch is processed ``nb_chunk`` columns per
    ``pallas_call`` so every walk visit serves 8 operand columns.
    Returns ``None`` outside the kernel envelope (caller falls back to
    the XLA engine), including the stride-4 ``matrix_mode='mm'`` layout
    which stays on the engine by contract.
    """
    if jnp.dtype(out_dtype) == jnp.float64:
        return None
    in_len, n_batch = B.shape
    n_rows, n_cols = (out_len, in_len) if corder else (in_len, out_len)
    chunk_size = _normalize_chunk_size(logical_cols, None)
    q_slots, n_chunks = _slot_layout(n_cols, chunk_size)
    L = n_chunks * _MV_STRIDE
    rows_p = _ceil_to(max(n_rows, 1), _BR)
    nb = min(nb_chunk, max(n_batch, 1))
    mem = (2 * _BR * _ceil_to(L, _LANES) * 4
           + (nb * q_slots + 2) * _ceil_to(L, _LANES) * 4 * 2
           + _BR * _ceil_to(nb * L, _LANES) * 4)
    if mem > _VMEM_LIMIT or q_slots < 1:
        return None

    gate = B
    if event:
        gate = (B.astype(jnp.float32) if B.dtype == jnp.bool_
                else (B > 0).astype(jnp.float32))
    gate = gate.astype(jnp.float32)
    pad_b = _ceil_to(max(n_batch, 1), nb) - n_batch
    if pad_b:
        gate = jnp.pad(gate, ((0, 0), (0, pad_b)))

    if setup is None:
        state2, q2, cl = walk_plan_setup(seed, clen, n_rows, n_cols,
                                         chunk_size)
    else:
        state2, q2, cl = setup
        if state2.shape != (n_rows, L):
            raise ValueError(
                f'walk plan setup shape {state2.shape} does not match this '
                f'product\'s walk layout {(n_rows, L)} — build the plan '
                f'from the SAME matrix orientation.')
    if rows_p != n_rows:
        padq = jnp.full((rows_p - n_rows, L), 0xFFFFFFFF, jnp.uint32)
        state2 = jnp.concatenate([state2, jnp.ones_like(padq)], axis=0)
        q2 = jnp.concatenate([q2, padq], axis=0)

    scal = jnp.stack([jnp.asarray(seed).astype(jnp.uint32).reshape(()),
                      cl.astype(jnp.uint32)]).reshape(1, 2)
    par = (jnp.stack([jnp.asarray(p).reshape(()).astype(jnp.float32)
                      for p in params]).reshape(1, npar)
           if npar else jnp.zeros((1, 1), jnp.float32))

    grid = (rows_p // _BR,)
    kernel = _make_mm_kernel(weight_fn_raw, npar, q_slots, L, chunk_size,
                             corder, nb)

    if corder:
        vspec = pl.BlockSpec((nb * q_slots, L), lambda i: (0, 0))
        ospec = pl.BlockSpec((_BR, nb), lambda i: (i, 0))
        oshape = jax.ShapeDtypeStruct((rows_p, nb), jnp.float32)
    else:
        vspec = pl.BlockSpec((_BR, nb), lambda i: (i, 0))
        ospec = pl.BlockSpec((nb * q_slots, L), lambda i: (0, 0))
        oshape = jax.ShapeDtypeStruct((nb * q_slots, L), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(npar, 1)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
            vspec,
        ],
        out_specs=ospec,
        out_shape=oshape,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )

    outs = []
    for b0 in range(0, n_batch + pad_b, nb):
        cols_b = gate[:, b0:b0 + nb]
        if corder:
            # batch stacked on the sublane axis (see _make_mm_kernel)
            xtile = jnp.concatenate(
                [_tile_cols(n_cols, chunk_size, q_slots, n_chunks,
                            cols_b[:, j]) for j in range(nb)], axis=0)
            out = call(scal, par, state2, q2, xtile)
            outs.append(out[:n_rows, :])
        else:
            xin = jnp.zeros((rows_p, nb), jnp.float32
                            ).at[:n_rows, :].set(cols_b)
            out = call(scal, par, state2, q2, xin)
            outs.append(jnp.stack(
                [_untile_cols(n_cols, chunk_size, q_slots, n_chunks,
                              out[j * q_slots:(j + 1) * q_slots, :])
                 for j in range(nb)], axis=1))
    res = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return res[:, :n_batch].astype(out_dtype)


def _make_todense_kernel(weight_fn, npar: int, q_slots: int, L: int,
                         chunk_size: int):
    """Materializing slot scan: slot ``s`` writes its (BR, L) tile of
    ``w * hit`` to sublane block ``s`` of the output — a pure store, no
    scatter/accumulation (each (row, col) belongs to exactly one
    (stream, slot))."""

    def kernel(scal_ref, par_ref, state_ref, q_ref, out_ref):
        pid = pl.program_id(0)
        seed = scal_ref[0, 0]
        cl = scal_ref[0, 1]
        params = [[par_ref[0, i]] for i in range(npar)]

        rows = (jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 0)
                + (pid * _BR).astype(jnp.uint32))
        lane = jax.lax.broadcasted_iota(jnp.uint32, (_BR, L), 1)
        base_cols = ((lane // _U(_MV_STRIDE)) * _U(chunk_size)
                     + lane % _U(_MV_STRIDE))

        def body(s, carry):
            state, q = carry
            su = s.astype(jnp.uint32)
            hit = q == su
            cols = base_cols + _U(_MV_STRIDE) * su
            w = weight_fn(params, seed, rows, cols).astype(jnp.float32)
            out_ref[pl.ds(s * _BR, _BR), :] = jnp.where(hit, w, 0.0)
            nxt = light_rng_next(state)
            q2 = q + _U(1) + light_rng_bounded(nxt, cl - _U(1))
            state = jnp.where(hit, nxt, state)
            q = jnp.where(hit, q2, q)
            return state, q

        jax.lax.fori_loop(0, q_slots, body, (state_ref[:], q_ref[:]))

    return kernel


def jitc_todense_pallas(weight_fn_raw, npar: int, params, seed, clen,
                        shape: Tuple[int, int], *, corder: bool,
                        out_dtype=jnp.float32, platform=None, setup=None):
    """Materialize the implicit matrix on the slot-scan Mosaic kernel.

    Same walk/layout contract as :func:`jitc_matvec_pallas` (stride-32
    mv-mode streams): the sampled structure and weights are identical to
    :func:`brainevent_tpu.jitc.engine.walk_todense` stream-for-stream —
    only the store order differs (tile-major instead of scatter-add; each
    (row, col) pair is visited by exactly one (stream, slot), so a plain
    store replaces the engine's ``.at[].add``). Returns the logical
    ``shape`` matrix, or ``None`` outside the kernel envelope (x64, VMEM)
    — the caller falls back to the XLA engine. Reference semantics:
    ``brainevent/_jit_normal/float.py:61`` (jitn materialize).
    """
    if jnp.dtype(out_dtype) == jnp.float64:
        return None
    m, k = shape
    n_rows, n_cols = (m, k) if corder else (k, m)
    # chunking is keyed on the LOGICAL column count (the stream-layout
    # contract, reference brainevent/_misc.py:74): corder=False walks m
    # columns but still chunks by k — exactly as engine.walk_todense's
    # ``logical_cols=k``
    chunk_size = _normalize_chunk_size(k, None)
    q_slots, n_chunks = _slot_layout(n_cols, chunk_size)
    L = n_chunks * _MV_STRIDE
    rows_p = _ceil_to(max(n_rows, 1), _BR)
    per_chunk = q_slots * _MV_STRIDE
    # VMEM envelope: state+q blocks + the (q_slots*BR, L) output tile
    mem = (2 * _BR * _ceil_to(L, _LANES) * 4
           + q_slots * _BR * _ceil_to(L, _LANES) * 4)
    if mem > _VMEM_LIMIT or q_slots < 1:
        return None

    if setup is None:
        state2, q2, cl = walk_plan_setup(seed, clen, n_rows, n_cols,
                                         chunk_size)
    else:
        state2, q2, cl = setup
        if state2.shape != (n_rows, L):
            raise ValueError(
                f'walk plan setup shape {state2.shape} does not match this '
                f'product\'s walk layout {(n_rows, L)} — build the plan '
                f'from the SAME matrix orientation.')
    if rows_p != n_rows:
        padq = jnp.full((rows_p - n_rows, L), 0xFFFFFFFF, jnp.uint32)
        state2 = jnp.concatenate([state2, jnp.ones_like(padq)], axis=0)
        q2 = jnp.concatenate([q2, padq], axis=0)

    scal = jnp.stack([jnp.asarray(seed).astype(jnp.uint32).reshape(()),
                      cl.astype(jnp.uint32)]).reshape(1, 2)
    par = (jnp.stack([jnp.asarray(p).reshape(()).astype(jnp.float32)
                      for p in params]).reshape(1, npar)
           if npar else jnp.zeros((1, 1), jnp.float32))

    grid = (rows_p // _BR,)
    kernel = _make_todense_kernel(weight_fn_raw, npar, q_slots, L,
                                  chunk_size)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(npar, 1)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_slots * _BR, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((grid[0] * q_slots * _BR, L),
                                       jnp.float32),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )(scal, par, state2, q2)

    # de-tile: program i, slot s, local row r, lane (ch, l32) holds
    # walk entry (row = i*BR + r, col = ch*chunk_size + 32*s + l32)
    x5 = out.reshape(grid[0], q_slots, _BR, n_chunks, _MV_STRIDE)
    x5 = x5.transpose(0, 2, 3, 1, 4)        # (i, r, ch, s, l32)
    flat = x5.reshape(rows_p, n_chunks * per_chunk)
    if chunk_size == per_chunk and n_chunks * chunk_size == n_cols:
        dense = flat
    else:
        parts = [flat[:, ch * per_chunk:
                      ch * per_chunk + min(chunk_size,
                                           n_cols - ch * chunk_size)]
                 for ch in range(n_chunks)]
        dense = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    dense = dense[:n_rows, :]
    res = dense if corder else dense.T
    return res.astype(out_dtype)


def jitc_matvec_pallas(weight_fn_raw, npar: int, params, seed, clen, v,
                       out_len: int, *, corder: bool, logical_cols: int,
                       event: bool = False, out_dtype=jnp.float32,
                       platform=None, setup=None):
    """Implicit mat-vec on the slot-scan Mosaic kernel.

    Same contract as :func:`brainevent_tpu.jitc.engine.walk_matvec` with
    ``stride=32`` (mv mode); ``weight_fn_raw(params, seed, rows, cols)``
    is the family's weight law, ``params`` a tuple of ``(1,)`` arrays.
    Returns ``None`` when the shape is outside the kernel's envelope
    (caller falls back to the XLA engine).
    """
    if jnp.dtype(out_dtype) == jnp.float64:
        return None              # Mosaic computes f32; keep x64 on XLA
    in_len = v.shape[0]
    n_rows, n_cols = (out_len, in_len) if corder else (in_len, out_len)
    chunk_size = _normalize_chunk_size(logical_cols, None)
    q_slots, n_chunks = _slot_layout(n_cols, chunk_size)
    L = n_chunks * _MV_STRIDE
    rows_p = _ceil_to(max(n_rows, 1), _BR)
    # VMEM envelope: state+q blocks + the slot tile + accumulator
    mem = (2 * _BR * _ceil_to(L, _LANES) * 4
           + (q_slots + 2) * _ceil_to(L, _LANES) * 4 * 2
           + _BR * _ceil_to(L, _LANES) * 4)
    if mem > _VMEM_LIMIT or q_slots < 1:
        return None

    gate = v
    if event:
        gate = (v.astype(jnp.float32) if v.dtype == jnp.bool_
                else (v > 0).astype(jnp.float32))
    gate = gate.astype(jnp.float32)

    # stream setup (stationary initial q) in XLA, the layout contract;
    # a walk plan (walk_plan_setup) hoists it out of repeated calls
    if setup is None:
        state2, q2, cl = walk_plan_setup(seed, clen, n_rows, n_cols,
                                         chunk_size)
    else:
        state2, q2, cl = setup
        if state2.shape != (n_rows, L):
            raise ValueError(
                f'walk plan setup shape {state2.shape} does not match this '
                f'product\'s walk layout {(n_rows, L)} — build the plan '
                f'from the SAME matrix orientation.')
    if rows_p != n_rows:
        padq = jnp.full((rows_p - n_rows, L), 0xFFFFFFFF, jnp.uint32)
        state2 = jnp.concatenate([state2, jnp.ones_like(padq)], axis=0)
        q2 = jnp.concatenate([q2, padq], axis=0)

    scal = jnp.stack([jnp.asarray(seed).astype(jnp.uint32).reshape(()),
                      cl.astype(jnp.uint32)]).reshape(1, 2)
    par = (jnp.stack([jnp.asarray(p).reshape(()).astype(jnp.float32)
                      for p in params]).reshape(1, npar)
           if npar else jnp.zeros((1, 1), jnp.float32))

    grid = (rows_p // _BR,)
    kernel = _make_kernel(weight_fn_raw, npar, q_slots, L, chunk_size,
                          corder)

    if corder:
        xtile = _tile_cols(n_cols, chunk_size, q_slots, n_chunks, gate)
        vspec = pl.BlockSpec((q_slots, L), lambda i: (0, 0))
        ospec = pl.BlockSpec((_BR, 1), lambda i: (i, 0))
        oshape = jax.ShapeDtypeStruct((rows_p, 1), jnp.float32)
    else:
        xtile = jnp.zeros((rows_p, 1), jnp.float32).at[:n_rows, 0].set(gate)
        vspec = pl.BlockSpec((_BR, 1), lambda i: (i, 0))
        ospec = pl.BlockSpec((q_slots, L), lambda i: (0, 0))
        oshape = jax.ShapeDtypeStruct((q_slots, L), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(npar, 1)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
            pl.BlockSpec((_BR, L), lambda i: (i, 0)),
            vspec,
        ],
        out_specs=ospec,
        out_shape=oshape,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )(scal, par, state2, q2, xtile)

    if corder:
        res = out.reshape(rows_p)[:n_rows]
    else:
        res = _untile_cols(n_cols, chunk_size, q_slots, n_chunks, out)
    return res.astype(out_dtype)


# =============================================================================
# stride-4 'mm'-layout slot scan
# =============================================================================
#
# The mm-mode walk (``matrix_mode='mm'``, reference ``brainevent/_misc.py:37``)
# keys streams at ``stride = 4``: stream ``(r, ch, l4)`` visits columns
# ``ch*chunk_size + 4*q + l4`` with ``l4 < 4``.  A row therefore owns only
# ``n_chunks * 4`` (~16) streams — far short of a 128-lane vector — so the
# mv kernels' row-per-sublane layout would waste 7/8 of every lane.  These
# kernels use a ROW-PACKED lane layout instead:
#
# - lane ``l = r32*4 + l4`` packs **32 walk rows x 4 stream lanes** per
#   128-lane vector;
# - the sublane axis enumerates ``(chunk, rowgroup)`` chunk-major:
#   sublane ``si`` holds chunk ``si // RG`` of rowgroup ``si % RG``
#   (``RG = _BR//32`` rowgroups of 32 rows per grid program);
# - the scan iterates ``s = 0..q_slots-1`` with ``q_slots =
#   ceil(chunk_size/4)``; a stream contributes when ``q == s`` and its
#   column is inside the chunk width, then advances one geometric skip —
#   the exact stream-advance contract of the XLA engine, so the sampled
#   matrix is identical by construction.
#
# All cross-lane reductions (over chunks, rowgroups and the 4 stream lanes
# of a row) happen OUTSIDE the kernel in XLA, where they are cheap
# elementwise sums over small arrays — the kernel body stays pure
# (SB, 128) vector ops plus the proven dynamic-sublane row reads/writes.

_RP = 32            # walk rows packed per 128-lane vector (128 // stride)


def _mm_geometry(n_rows: int, n_cols: int, chunk_size: int):
    """(q_slots, n_chunks, RG, SB, rows_p, nprog) of the packed layout."""
    n_chunks = -(-n_cols // chunk_size)
    q_slots = -(-chunk_size // _MM_STRIDE)
    RG = _BR // _RP
    rows_p = _ceil_to(max(n_rows, 1), _BR)
    nprog = rows_p // _BR
    SB = n_chunks * RG
    return q_slots, n_chunks, RG, SB, rows_p, nprog


def walk_plan_setup_mm(seed, clen, n_rows: int, n_cols: int,
                       chunk_size: int):
    """Stream setup for the stride-4 mm-mode walk.

    Returns ``(state (n_rows, n_chunks*4) u32, q (n_rows, n_chunks*4) u32,
    cl () u32)`` in ``(row, ch*4 + l4)`` order — the hoistable (expensive,
    rejection-sampled) part of every mm-mode product, exactly as
    :func:`walk_plan_setup` is for the stride-32 layout.
    """
    n_chunks = -(-n_cols // chunk_size)
    _, _, _, state, q, cl = engine.walk_setup(
        seed, clen, n_rows, n_cols, _MM_STRIDE, chunk_size)
    L = n_chunks * _MM_STRIDE
    return state.reshape(n_rows, L), q.reshape(n_rows, L), cl


def _pack_mm(arr2, n_rows: int, n_chunks: int, RG: int, rows_p: int,
             fill):
    """(n_rows, n_chunks*4) -> (nprog*SB, 128) packed stream layout.

    Row ``pid*SB + ch*RG + rg``, lane ``r32*4 + l4`` holds stream
    ``(row = pid*_BR + rg*32 + r32, ch, l4)``; pad rows carry *fill*.
    """
    nprog = rows_p // _BR
    if rows_p != n_rows:
        arr2 = jnp.concatenate(
            [arr2, jnp.full((rows_p - n_rows, arr2.shape[1]), fill,
                            arr2.dtype)], axis=0)
    a5 = arr2.reshape(nprog, RG, _RP, n_chunks, _MM_STRIDE)
    return a5.transpose(0, 3, 1, 2, 4).reshape(
        nprog * n_chunks * RG, _RP * _MM_STRIDE)


def _mm_operand_tile(gate: jax.Array, n_cols: int, chunk_size: int,
                     q_slots: int, n_chunks: int) -> jax.Array:
    """Arrange the operand column ``gate (n_cols,)`` as the
    ``(n_chunks*q_slots, 128)`` slot tile: row ``ch*q_slots + s``, lane
    ``r32*4 + l4`` holds ``gate[ch*chunk_size + 4*s + l4]`` (0 past the
    chunk width) — the same value for every ``r32``."""
    per_chunk = q_slots * _MM_STRIDE
    frames = []
    for ch in range(n_chunks):
        lo = ch * chunk_size
        width = min(chunk_size, n_cols - lo)
        frames.append(jnp.zeros((per_chunk,), gate.dtype).at[:width].set(
            gate[lo:lo + width]))
    xp = jnp.stack(frames).reshape(n_chunks * q_slots, 1, _MM_STRIDE)
    return jnp.broadcast_to(xp, (n_chunks * q_slots, _RP, _MM_STRIDE)
                            ).reshape(n_chunks * q_slots, _LANES)


def _make_mm_layout_kernel(weight_fn, npar: int, q_slots: int,
                           n_chunks: int, RG: int, chunk_size: int,
                           n_cols: int, corder: bool, nb: int):
    """Kernel body of the stride-4 slot scan (see module section note).

    ``corder=True`` (gather): accumulates ``(SB, nb*128)`` per-stream
    partial sums, reduced to rows in XLA. ``corder=False`` (scatter):
    accumulates into the ``(nb*n_chunks*q_slots, 128)`` slot tile via
    dynamic-sublane row RMWs, de-tiled in XLA.
    """
    SB = n_chunks * RG

    def kernel(scal_ref, par_ref, state_ref, q_ref, x_ref, out_ref):
        pid = pl.program_id(0)
        seed = scal_ref[0, 0]
        cl = scal_ref[0, 1]
        params = [[par_ref[0, i]] for i in range(npar)]

        si = jax.lax.broadcasted_iota(jnp.uint32, (SB, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (SB, _LANES), 1)
        ch = si // _U(RG)
        rg = si % _U(RG)
        r32 = lane // _U(_MM_STRIDE)
        l4 = lane % _U(_MM_STRIDE)
        rows = (pid * _BR).astype(jnp.uint32) + rg * _U(_RP) + r32
        base_cols = ch * _U(chunk_size) + l4
        # chunk width (short last chunk): stream (ch, l4) is live at
        # slot s iff local_j = 4*s + l4 < min(chunk_size, n_cols -
        # ch*chunk_size) — expressed min-free (Mosaic cannot legalize
        # vector minui) as (local_j < chunk_size) & (col < n_cols)

        if not corder:
            @pl.when(pid == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        def body(s, carry):
            state, q, acc = carry
            su = s.astype(jnp.uint32)
            hit = q == su
            lj = _U(_MM_STRIDE) * su + l4
            cols = base_cols + _U(_MM_STRIDE) * su
            valid = (lj < _U(chunk_size)) & (cols < _U(n_cols))
            w = weight_fn(params, seed, rows, cols).astype(jnp.float32)
            masked = jnp.where(hit & valid, w, 0.0)          # (SB, 128)
            if corder:
                accs = []
                for b in range(nb):
                    xrows = [x_ref[pl.ds((b * n_chunks + c) * q_slots + s,
                                         1), :] for c in range(n_chunks)]
                    xblk = jnp.concatenate(
                        [jnp.broadcast_to(xr, (RG, _LANES))
                         for xr in xrows], axis=0)           # (SB, 128)
                    accs.append(acc[:, b * _LANES:(b + 1) * _LANES]
                                + masked * xblk)
                acc = accs[0] if nb == 1 else jnp.concatenate(accs, axis=1)
            else:
                for b in range(nb):
                    vb = masked * (x_ref[:, b * _LANES:(b + 1) * _LANES]
                                   if nb > 1 else x_ref[:])   # (SB, 128)
                    for c in range(n_chunks):
                        row = pl.ds((b * n_chunks + c) * q_slots + s, 1)
                        out_ref[row, :] = (
                            out_ref[row, :]
                            + jnp.sum(vb[c * RG:(c + 1) * RG, :],
                                      axis=0, keepdims=True))
            nxt = light_rng_next(state)
            q2 = q + _U(1) + light_rng_bounded(nxt, cl - _U(1))
            state = jnp.where(hit, nxt, state)
            q = jnp.where(hit, q2, q)
            return state, q, acc

        acc0 = jnp.zeros((SB, nb * _LANES if corder else 1), jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, q_slots, body,
                                      (state_ref[:], q_ref[:], acc0))
        if corder:
            out_ref[:] = acc

    return kernel


def jitc_matmat_pallas_mm(weight_fn_raw, npar: int, params, seed, clen, B,
                          out_len: int, *, corder: bool, logical_cols: int,
                          event: bool = False, out_dtype=jnp.float32,
                          platform=None, nb_chunk: int = 8, setup=None):
    """Implicit mat-mat on the stride-4 (mm-layout) slot-scan kernel.

    The walk samples the ``matrix_mode='mm'`` matrix (stride-4 streams,
    reference ``brainevent/_misc.py:37-38``) — a DIFFERENT matrix from the
    stride-32 mv layout by contract.  ``nb_chunk`` operand columns ride
    each kernel call, so the per-visit RNG/weight cost is amortized across
    the batch.  Returns ``None`` outside the envelope (x64, VMEM); the
    caller falls back to the XLA engine.
    """
    if jnp.dtype(out_dtype) == jnp.float64:
        return None
    in_len, n_batch = B.shape
    n_rows, n_cols = (out_len, in_len) if corder else (in_len, out_len)
    chunk_size = _normalize_chunk_size(logical_cols, None)
    q_slots, n_chunks, RG, SB, rows_p, nprog = _mm_geometry(
        n_rows, n_cols, chunk_size)
    nb = min(nb_chunk, max(n_batch, 1))
    tile_rows = nb * n_chunks * q_slots
    mem = (2 * SB * _LANES * 4 * nprog                 # state + q
           + (tile_rows + SB) * _LANES * 4             # x tile + one block
           + SB * nb * _LANES * 4)                     # accumulator
    if mem > _VMEM_LIMIT or q_slots < 1:
        return None

    gate = B
    if event:
        gate = (B.astype(jnp.float32) if B.dtype == jnp.bool_
                else (B > 0).astype(jnp.float32))
    gate = gate.astype(jnp.float32)
    pad_b = _ceil_to(max(n_batch, 1), nb) - n_batch
    if pad_b:
        gate = jnp.pad(gate, ((0, 0), (0, pad_b)))

    if setup is None:
        state2, q2, cl = walk_plan_setup_mm(seed, clen, n_rows, n_cols,
                                            chunk_size)
    else:
        state2, q2, cl = setup
        if state2.shape != (n_rows, n_chunks * _MM_STRIDE):
            raise ValueError(
                f'mm walk plan setup shape {state2.shape} does not match '
                f'this product\'s walk layout '
                f'{(n_rows, n_chunks * _MM_STRIDE)} — build the plan from '
                f'the SAME matrix orientation and mode.')
    statep = _pack_mm(state2, n_rows, n_chunks, RG, rows_p, 1)
    qp = _pack_mm(q2, n_rows, n_chunks, RG, rows_p, 0xFFFFFFFF)

    scal = jnp.stack([jnp.asarray(seed).astype(jnp.uint32).reshape(()),
                      cl.astype(jnp.uint32)]).reshape(1, 2)
    par = (jnp.stack([jnp.asarray(p).reshape(()).astype(jnp.float32)
                      for p in params]).reshape(1, npar)
           if npar else jnp.zeros((1, 1), jnp.float32))

    grid = (nprog,)
    kernel = _make_mm_layout_kernel(weight_fn_raw, npar, q_slots, n_chunks,
                                    RG, chunk_size, n_cols, corder, nb)
    if corder:
        vspec = pl.BlockSpec((tile_rows, _LANES), lambda i: (0, 0))
        ospec = pl.BlockSpec((SB, nb * _LANES), lambda i: (i, 0))
        oshape = jax.ShapeDtypeStruct((nprog * SB, nb * _LANES),
                                      jnp.float32)
    else:
        vspec = pl.BlockSpec((SB, nb * _LANES), lambda i: (i, 0))
        ospec = pl.BlockSpec((tile_rows, _LANES), lambda i: (0, 0))
        oshape = jax.ShapeDtypeStruct((tile_rows, _LANES), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(npar, 1)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SB, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((SB, _LANES), lambda i: (i, 0)),
            vspec,
        ],
        out_specs=ospec,
        out_shape=oshape,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )

    per_chunk = q_slots * _MM_STRIDE
    outs = []
    for b0 in range(0, n_batch + pad_b, nb):
        cols_b = gate[:, b0:b0 + nb]
        if corder:
            xtile = jnp.concatenate(
                [_mm_operand_tile(cols_b[:, j], n_cols, chunk_size,
                                  q_slots, n_chunks) for j in range(nb)],
                axis=0)
            out = call(scal, par, statep, qp, xtile)
            # (nprog*SB, nb*128): rows (nprog, ch, rg), lanes (b, r32, l4)
            # -> per-row sums over (ch, l4)
            o6 = out.reshape(nprog, n_chunks, RG, nb, _RP, _MM_STRIDE)
            rows = (jnp.sum(o6, axis=(1, 5))       # (nprog, RG, nb, _RP)
                    .transpose(0, 1, 3, 2).reshape(rows_p, nb))
            outs.append(rows[:n_rows, :])
        else:
            # operand packed exactly like the stream rows: batch b's
            # column at lane block b, lane r32*4 + l4 (replicated over
            # chunk sublanes and the 4 stream lanes)
            cols_pad = jnp.zeros((rows_p, nb), jnp.float32
                                 ).at[:n_rows, :].set(cols_b)
            vt = jnp.broadcast_to(
                cols_pad.reshape(nprog, 1, RG, _RP, nb)[..., None],
                (nprog, n_chunks, RG, _RP, nb, _MM_STRIDE))
            vt = (vt.transpose(0, 1, 2, 4, 3, 5)
                  .reshape(nprog * SB, nb * _LANES))
            out = call(scal, par, statep, qp, vt)
            # (nb*n_chunks*q_slots, 128): sum over r32, de-tile cols
            o5 = out.reshape(nb, n_chunks, q_slots, _RP, _MM_STRIDE)
            o3 = jnp.sum(o5, axis=3).reshape(nb, n_chunks * per_chunk)
            parts = []
            for c in range(n_chunks):
                width = min(chunk_size, n_cols - c * chunk_size)
                parts.append(o3[:, c * per_chunk:c * per_chunk + width])
            full = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])
            outs.append(full.T)
    res = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return res[:, :n_batch].astype(out_dtype)


def jitc_matvec_pallas_mm(weight_fn_raw, npar: int, params, seed, clen, v,
                          out_len: int, *, corder: bool, logical_cols: int,
                          event: bool = False, out_dtype=jnp.float32,
                          platform=None, setup=None):
    """Implicit mat-vec on the stride-4 (mm-layout) slot scan — the
    ``matrix_mode='mm'`` variant of :func:`jitc_matvec_pallas` (one
    operand column through the batched kernel)."""
    out = jitc_matmat_pallas_mm(
        weight_fn_raw, npar, params, seed, clen, v.reshape(-1, 1), out_len,
        corder=corder, logical_cols=logical_cols, event=event,
        out_dtype=out_dtype, platform=platform, nb_chunk=1, setup=setup)
    return None if out is None else out.reshape(-1)


def _make_todense_mm_kernel(weight_fn, npar: int, q_slots: int,
                            n_chunks: int, RG: int, chunk_size: int,
                            n_cols: int):
    """Materializing stride-4 slot scan: slot ``s`` stores its
    ``(SB, 128)`` packed tile — each (row, col) belongs to exactly one
    (stream, slot), so plain stores suffice (cf. the stride-32
    :func:`_make_todense_kernel`)."""
    SB = n_chunks * RG

    def kernel(scal_ref, par_ref, state_ref, q_ref, out_ref):
        pid = pl.program_id(0)
        seed = scal_ref[0, 0]
        cl = scal_ref[0, 1]
        params = [[par_ref[0, i]] for i in range(npar)]

        si = jax.lax.broadcasted_iota(jnp.uint32, (SB, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (SB, _LANES), 1)
        ch = si // _U(RG)
        rg = si % _U(RG)
        r32 = lane // _U(_MM_STRIDE)
        l4 = lane % _U(_MM_STRIDE)
        rows = (pid * _BR).astype(jnp.uint32) + rg * _U(_RP) + r32
        base_cols = ch * _U(chunk_size) + l4

        def body(s, carry):
            state, q = carry
            su = s.astype(jnp.uint32)
            hit = q == su
            lj = _U(_MM_STRIDE) * su + l4
            cols = base_cols + _U(_MM_STRIDE) * su
            valid = (lj < _U(chunk_size)) & (cols < _U(n_cols))
            w = weight_fn(params, seed, rows, cols).astype(jnp.float32)
            out_ref[pl.ds(s * SB, SB), :] = jnp.where(hit & valid, w, 0.0)
            nxt = light_rng_next(state)
            q2 = q + _U(1) + light_rng_bounded(nxt, cl - _U(1))
            state = jnp.where(hit, nxt, state)
            q = jnp.where(hit, q2, q)
            return state, q

        jax.lax.fori_loop(0, q_slots, body, (state_ref[:], q_ref[:]))

    return kernel


def jitc_todense_pallas_mm(weight_fn_raw, npar: int, params, seed, clen,
                           shape: Tuple[int, int], *, corder: bool,
                           out_dtype=jnp.float32, platform=None,
                           setup=None):
    """Materialize the stride-4 (``matrix_mode='mm'``) implicit matrix on
    the packed-lane slot scan; bit-exact vs the XLA walk (store order is
    the only difference).  Returns ``None`` outside the envelope."""
    if jnp.dtype(out_dtype) == jnp.float64:
        return None
    m, k = shape
    n_rows, n_cols = (m, k) if corder else (k, m)
    chunk_size = _normalize_chunk_size(k, None)
    q_slots, n_chunks, RG, SB, rows_p, nprog = _mm_geometry(
        n_rows, n_cols, chunk_size)
    mem = 2 * SB * _LANES * 4 + q_slots * SB * _LANES * 4
    if mem > _VMEM_LIMIT or q_slots < 1:
        return None

    if setup is None:
        state2, q2, cl = walk_plan_setup_mm(seed, clen, n_rows, n_cols,
                                            chunk_size)
    else:
        state2, q2, cl = setup
        if state2.shape != (n_rows, n_chunks * _MM_STRIDE):
            raise ValueError(
                f'mm walk plan setup shape {state2.shape} does not match '
                f'this product\'s walk layout '
                f'{(n_rows, n_chunks * _MM_STRIDE)}.')
    statep = _pack_mm(state2, n_rows, n_chunks, RG, rows_p, 1)
    qp = _pack_mm(q2, n_rows, n_chunks, RG, rows_p, 0xFFFFFFFF)

    scal = jnp.stack([jnp.asarray(seed).astype(jnp.uint32).reshape(()),
                      cl.astype(jnp.uint32)]).reshape(1, 2)
    par = (jnp.stack([jnp.asarray(p).reshape(()).astype(jnp.float32)
                      for p in params]).reshape(1, npar)
           if npar else jnp.zeros((1, 1), jnp.float32))

    kernel = _make_todense_mm_kernel(weight_fn_raw, npar, q_slots,
                                     n_chunks, RG, chunk_size, n_cols)
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(npar, 1)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SB, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((SB, _LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_slots * SB, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nprog * q_slots * SB, _LANES),
                                       jnp.float32),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )(scal, par, statep, qp)

    # de-tile: program p, slot s, sublane (ch, rg), lane (r32, l4) holds
    # (row = p*_BR + rg*32 + r32, col = ch*chunk_size + 4*s + l4)
    per_chunk = q_slots * _MM_STRIDE
    x7 = out.reshape(nprog, q_slots, n_chunks, RG, _RP, _MM_STRIDE)
    x7 = x7.transpose(0, 3, 4, 2, 1, 5)    # (p, rg, r32, ch, s, l4)
    flat = x7.reshape(rows_p, n_chunks * per_chunk)
    if chunk_size == per_chunk and n_chunks * chunk_size == n_cols:
        dense = flat
    else:
        parts = [flat[:, c * per_chunk:
                      c * per_chunk + min(chunk_size,
                                          n_cols - c * chunk_size)]
                 for c in range(n_chunks)]
        dense = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    dense = dense[:n_rows, :]
    res = dense if corder else dense.T
    return res.astype(out_dtype)
