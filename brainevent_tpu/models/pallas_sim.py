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

"""Whole-simulation Pallas mega-kernels for EI networks.

The GPU reference pays per-step kernel-launch and HBM round-trip costs
(~26.6 us/step on an A6000 at 4k neurons). These kernels remove both: the
ENTIRE multi-step simulation runs inside one ``pallas_call`` with every
buffer resident in VMEM, shaped by the Mosaic addressing rules measured on
hardware (BENCH_NOTES.md): dynamic *sublane* indexing works (scalar reads,
slice copies, length-1 RMW); dynamic *lane* indexing, vector gathers/
scatters, and in-kernel reshapes do not.

Four propagation strategies are provided (``einet_pallas_sim`` docstring
has the measured numbers; ``mxu2`` wins everywhere):

- ``mxu2``: vectorized event compaction — prefix-sum slot map, one-hot id
  gather, one row copy per event, stacked one-hot MXU contraction. The
  only serialized work is O(events) row copies; everything else is VPU/MXU.
- ``dense``: one ``(2, num) @ (num, num)`` bf16 contraction per step
  against a connection-count table; rate-independent, table <= ~6k neurons.
- ``mxu``: branchy hierarchical firing scan + per-channel event buffers +
  chunked one-hot contraction (kept as the measured baseline for why
  branches lose: each ``pl.when`` gate is a serialized scalar-unit read).
- ``chain``: per-synapse interleaved length-1 RMW chains (the atomicAdd
  analogue; scalar-unit bound).

All strategies share the exact count-then-scale contract with
``EINet._propagate`` (binary/integer factors on the MXU, homogeneous
weights applied after), so kernel and XLA loop agree bit-for-bit over
thousands of steps, and all handle firing bursts exactly (overflow
fallback / multi-round compaction). Neuron state stays compact
``(num/128, 128)`` for full-width VPU math (dense: ``(1, num)`` rows
feeding the contraction directly).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode

__all__ = ['einet_pallas_sim', 'einet_pallas_sim_mxu',
           'einet_pallas_sim_mxu2', 'einet_pallas_sim_mxu3',
           'einet_pallas_sim_mxu4', 'einet_pallas_sim_mxu5',
           'einet_pallas_sim_mxu6', 'mxu6_conn_table',
           'einet_pallas_sim_chain', 'einet_pallas_sim_dense']

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # v5e exposes 128 MB of VMEM here
_BLOCK = 128        # neurons per scan block == lanes, statically unrolled
_MXU_CHUNK = 4096   # events per in-kernel one-hot contraction chunk
_CHAINS = 16        # interleaved accumulator columns per channel (RMW chains)


def einet_pallas_sim(net, state, n_steps: int, inp: float = 20.0,
                     platform=None, strategy: str = 'auto', **knobs):
    """Run ``n_steps`` of an :class:`~brainevent_tpu.models.EINet` inside one
    Pallas kernel; returns ``(v, t_last, g_e, g_i, spike_count)``.

    Strategies (``'auto'`` = ``'mxu3'`` below 40k neurons and the tuned
    ``'mxu6'`` at/above it; fresh-process correct-protocol numbers on a
    v5e — 5.0 us/step at 4k (bench.py, mxu3), 14.9 at 40k / 29.2 at
    100k / 188.4 at 400k (mxu6 tuned); BENCH_NOTES.md round-3
    continuation):

    - ``'mxu3'``: mxu2 + two-stage compaction, mantissa-packed one-hot
      factors, bf16 scratch factor builds, optional HBM-resident table
      with per-event DMA row fetches (sizes past the VMEM ceiling).
    - ``'mxu6'``: mxu3 with a target-partitioned table (two-level
      one-hot; 188.4 us/step at 400k with the tuned default knobs
      (rpb=384, unroll=4, gather='block', prefetch, fused_load) vs
      mxu3's 408, and ~10x cheaper Mosaic compiles at that size —
      BENCH_NOTES "mxu6 knob A/B"). At several-hundred-MB table sizes
      pass ``conn_table=mxu6_conn_table(net, ...)`` through your
      ``jax.jit`` arguments (embedded constants of that size are
      rejected by the remote-compile relay with HTTP 413).
    - ``'mxu2'``: fully vectorized event compaction (prefix-sum position
      map -> one-hot id gather -> row collection -> stacked one-hot MXU
      contraction); no branchy scans, exact at any rate via multi-round
      overflow handling.
    - ``'dense'``: one ``(2, num) @ (num, num)`` bf16 MXU contraction per
      step (10.9 us at 4k) — rate-INDEPENDENT cost, so preferable for
      pathologically synchronous regimes; table caps at ~6k neurons.
    - ``'mxu'``: branchy-scan event collection + chunked one-hot
      contraction (31 us at 4k); superseded by mxu2.
    - ``'chain'``: per-synapse interleaved length-1 RMW chains (39 us at
      4k); scalar-unit bound, kept for comparison.

    Raises ValueError when the VMEM-resident footprint exceeds the budget
    (fall back to ``net.run`` or the sharded model).
    """
    if strategy == 'auto':
        strategy = _auto_strategy(net.num)
    fn = {'chain': einet_pallas_sim_chain, 'mxu': einet_pallas_sim_mxu,
          'mxu2': einet_pallas_sim_mxu2, 'mxu3': einet_pallas_sim_mxu3,
          'mxu4': einet_pallas_sim_mxu4, 'mxu5': einet_pallas_sim_mxu5,
          'mxu6': einet_pallas_sim_mxu6,
          'dense': einet_pallas_sim_dense}
    # strategy-specific knobs (e.g. conn_table=, radix=, table_space=)
    # forward to the selected engine — without this, relay-attached hosts
    # could not reach the auto path at 400k (conn_table must be a jit
    # ARGUMENT there; embedded it trips the HTTP 413 compile limit)
    return fn[strategy](net, state, n_steps, inp, platform, **knobs)


def _auto_strategy(num: int) -> str:
    """Measured v5e crossover (BENCH_NOTES round-3 continuation): tuned
    mxu6 wins every size >= 40k (14.9 vs 16.0 us/step at 40k, 29.2 vs
    50.1 at 100k, 188.4 vs 408 at 400k); mxu3 keeps the 4k headline
    (4.99 us/step)."""
    return 'mxu6' if num >= 40_000 else 'mxu3'


def _capacity(n: int, minimum: int) -> int:
    """Static per-step event capacity.

    The MXU phase's fixed cost scales with capacity (not with the live
    count), so this is deliberately tight: ~4x the expected actives at the
    ~23 Hz balanced-regime rate (n * 23 Hz * 0.1 ms ~= n/435). Overflow is
    handled exactly by the per-event fallback, so a transient burst only
    slows its own step."""
    return max(minimum, -(-n // 128))


def einet_pallas_sim_mxu(net, state, n_steps: int, inp: float = 20.0,
                         platform=None):
    """Two-phase (collect -> MXU contract) whole-simulation kernel; see the
    module docstring. Prefer :func:`einet_pallas_sim_chain` at low rates."""
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    cap_e = _capacity(net.n_exc, 32)
    cap_i = _capacity(num - net.n_exc, 16)
    table_bytes = num * n_conn * 4
    # event buffers are (cap*n_conn, 1) columns -> lane-padded x128
    buf_bytes = (cap_e + cap_i) * n_conn * 128 * 4
    state_bytes = 16 * num * 4
    total = table_bytes + buf_bytes + state_bytes
    if total > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({total/1e6:.1f} MB: table '
            f'{table_bytes/1e6:.1f} + event buffers {buf_bytes/1e6:.1f}) '
            f'exceeds the budget; use EINet.run for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba
    n_exc = net.n_exc
    R = num // _BLOCK

    def kernel(conn_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               spk_ref, blkflag_ref, subflag_ref,
               ebuf_ref, ibuf_ref, ecnt_ref, icnt_ref,
               ince_c_ref, inci_c_ref):
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        one11 = jnp.ones((1, 1), jnp.int32)

        def overflow_scatter(inc_c_ref, base, lane, w):
            """Exact per-synapse row one-hot fallback (rare)."""
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)

            def syn(k, _):
                tgt = conn_ref[base + k, lane]
                blk = tgt // _BLOCK
                hot = jnp.where(lane_iota == tgt % _BLOCK, w, 0.0)
                inc_c_ref[pl.ds(blk, 1), :] = \
                    inc_c_ref[pl.ds(blk, 1), :] + hot
                return 0

            jax.lax.fori_loop(0, n_conn, syn, 0)

        def collect(buf_ref, cnt1_ref, inc_c_ref, cap, base, lane, w):
            c = cnt1_ref[0, 0]

            @pl.when(c < cap)
            def _append():
                buf_ref[pl.ds(c * n_conn, n_conn), :] = \
                    conn_ref[pl.ds(base, n_conn), lane:lane + 1]
                cnt1_ref[0:1, 0:1] = (c + 1) * one11

            @pl.when(c >= cap)
            def _overflow():
                overflow_scatter(inc_c_ref, base, lane, w)

        def mxu_scatter(buf_ref, cnt1_ref, inc_c_ref, cap, w):
            """Contract the collected events into the compact accumulator.

            Both one-hot factors are BINARY (bf16-exact), so the default
            MXU precision is safe: the f32 accumulator holds exact integer
            hit counts, scaled by the homogeneous weight afterwards."""
            e_total = cap * n_conn
            cnt_syn = cnt1_ref[0, 0] * n_conn
            acc = jnp.zeros((R, _BLOCK), jnp.float32)
            n_chunks = -(-e_total // _MXU_CHUNK)
            for ci in range(n_chunks):
                c0 = ci * _MXU_CHUNK
                ch = min(_MXU_CHUNK, e_total - c0)
                tgt = buf_ref[pl.ds(c0, ch), :]              # (ch, 1) i32
                eidx = c0 + jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)
                valid = eidx < cnt_syn                       # (ch, 1) bool
                blk_iota = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                lane_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, _BLOCK), 1)
                m2 = ((tgt // _BLOCK == blk_iota) & valid).astype(jnp.float32)
                m1 = (tgt % _BLOCK == lane_iota).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    m2, m1, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            inc_c_ref[:] = inc_c_ref[:] + w * acc

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            # -- membrane update first: this step's threshold crossings are
            # the spikes to propagate (matches EINet.step — detect BEFORE
            # the reset erases the crossing).
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            spk = spike.astype(jnp.int32)
            spk_ref[:] = spk
            blkflag_ref[:] = jnp.max(spk, axis=1, keepdims=True)
            for s in range(_BLOCK // 8):
                subflag_ref[:, s:s + 1] = jnp.max(
                    spk[:, s * 8:(s + 1) * 8], axis=1, keepdims=True)
            ecnt_ref[:] = jnp.zeros_like(ecnt_ref)
            icnt_ref[:] = jnp.zeros_like(icnt_ref)
            ince_c_ref[:] = jnp.zeros_like(ince_c_ref)
            inci_c_ref[:] = jnp.zeros_like(inci_c_ref)

            def fire(b, lane):
                base = b * n_conn
                i = b * _BLOCK + lane

                @pl.when(i < n_exc)
                def _e():
                    collect(ebuf_ref, ecnt_ref, ince_c_ref, cap_e,
                            base, lane, w_e)

                @pl.when(i >= n_exc)
                def _i():
                    collect(ibuf_ref, icnt_ref, inci_c_ref, cap_i,
                            base, lane, w_i)

            def block(b, _):
                @pl.when(blkflag_ref[b, 0] > 0)
                def _():
                    for sub in range(_BLOCK // 8):
                        @pl.when(subflag_ref[b, sub] > 0)
                        def _sub(sub=sub):
                            for j in range(8):
                                lane = sub * 8 + j

                                @pl.when(spk_ref[b, lane] > 0)
                                def _fire(lane=lane):
                                    fire(b, lane)
                return 0

            jax.lax.fori_loop(0, R, block, 0)

            mxu_scatter(ebuf_ref, ecnt_ref, ince_c_ref, cap_e, w_e)
            mxu_scatter(ibuf_ref, icnt_ref, inci_c_ref, cap_i, w_i)

            ge_ref[:] = ge + ince_c_ref[:]
            gi_ref[:] = gi + inci_c_ref[:]
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sim = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 5,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((R, _BLOCK), jnp.int32),            # spike flags
            pltpu.VMEM((R, 1), jnp.int32),                 # block gates
            pltpu.VMEM((R, _BLOCK // 8), jnp.int32),       # sub-block gates
            pltpu.VMEM((cap_e * n_conn, 1), jnp.int32),    # exc event buffer
            pltpu.VMEM((cap_i * n_conn, 1), jnp.int32),    # inh event buffer
            pltpu.VMEM((1, 1), jnp.int32),                 # exc count
            pltpu.VMEM((1, 1), jnp.int32),                 # inh count
            pltpu.VMEM((R, _BLOCK), jnp.float32),          # inc_e compact
            pltpu.VMEM((R, _BLOCK), jnp.float32),          # inc_i compact
        ],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    conn = jnp.pad(net.conn_all, ((0, pad), (0, 0)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        # (num, n_conn) -> (num/128, 128, n_conn) -> (num/128, n_conn, 128)
        # -> (num/128 * n_conn, 128): row b*n_conn+k, lane l holds
        # conn[b*128 + l, k]
        conn.reshape(num // _BLOCK, _BLOCK, n_conn)
        .transpose(0, 2, 1).reshape(-1, _BLOCK),
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_chain(net, state, n_steps: int, inp: float = 20.0,
                           platform=None):
    """Whole-simulation kernel with interleaved RMW chain scatter.

    Each firing neuron's targets are walked on the scalar unit; hits land as
    ``+1.0`` length-1 RMWs spread over ``_CHAINS`` accumulator columns per
    channel (distinct columns -> the read-modify-writes pipeline instead of
    serializing on one address). A single transpose + static row copies fold
    the chain columns back to the compact ``(num/128, 128)`` layout, scaled
    by the homogeneous weight (exact integer counts, same count-then-scale
    contract as ``EINet._propagate``).
    """
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    if n_conn % _CHAINS != 0:
        raise ValueError(f'n_conn ({n_conn}) must be a multiple of {_CHAINS}.')
    # pad to a 128 multiple with permanently-refractory dummy neurons
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    table_bytes = num * n_conn * 4
    # chain accumulators are (num, 32) logical but lane-padded to 128
    chains_bytes = 2 * num * 128 * 4
    state_bytes = 12 * num * 4
    total = table_bytes + chains_bytes + state_bytes
    if total > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({total/1e6:.1f} MB: table '
            f'{table_bytes/1e6:.1f} + accumulators {chains_bytes/1e6:.1f}) '
            f'exceeds the budget; use EINet.run for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba
    n_exc = net.n_exc
    R = num // _BLOCK

    def kernel(conn_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               spk_ref, inc_ref, pair_ref, ince_c_ref, inci_c_ref,
               blkflag_ref, subflag_ref):
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            # membrane update first: THIS step's crossings are the spikes to
            # propagate (detect before the reset erases the crossing —
            # matches EINet.step)
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            spk = spike.astype(jnp.int32)
            spk_ref[:] = spk
            # all scan gates precomputed vectorized, once per step
            blkflag_ref[:] = jnp.max(spk, axis=1, keepdims=True)
            for s in range(_BLOCK // 8):
                subflag_ref[:, s:s + 1] = jnp.max(
                    spk[:, s * 8:(s + 1) * 8], axis=1, keepdims=True)
            inc_ref[:] = jnp.zeros_like(inc_ref)

            def fire(b, lane):
                # conn rows [b*n_conn, (b+1)*n_conn) at static lane hold
                # neuron i = b*128+lane's targets; synapse groups of
                # _CHAINS land in distinct accumulator columns so the
                # read-modify-writes pipeline. Excitatory events use
                # columns [0, _CHAINS), inhibitory [_CHAINS, 2*_CHAINS).
                base = b * n_conn
                i = b * _BLOCK + lane

                def mk_group(off):
                    def group(g, _):
                        row = base + g * _CHAINS
                        for c in range(_CHAINS):
                            tgt = conn_ref[row + c, lane]
                            inc_ref[pl.ds(tgt, 1), off + c:off + c + 1] = \
                                inc_ref[pl.ds(tgt, 1), off + c:off + c + 1] \
                                + 1.0
                        return 0
                    return group

                @pl.when(i < n_exc)
                def _e():
                    jax.lax.fori_loop(0, n_conn // _CHAINS, mk_group(0), 0)

                @pl.when(i >= n_exc)
                def _i():
                    jax.lax.fori_loop(0, n_conn // _CHAINS,
                                      mk_group(_CHAINS), 0)

            def block(b, _):
                @pl.when(blkflag_ref[b, 0] > 0)
                def _():
                    # static unroll: 8-neuron sub-gates, then per-lane
                    # checks; all lane indices are compile-time constants
                    for sub in range(_BLOCK // 8):
                        @pl.when(subflag_ref[b, sub] > 0)
                        def _sub(sub=sub):
                            for j in range(8):
                                lane = sub * 8 + j

                                @pl.when(spk_ref[b, lane] > 0)
                                def _fire(lane=lane):
                                    fire(b, lane)
                return 0

            jax.lax.fori_loop(0, R, block, 0)

            # chain-sum -> ONE transpose -> static row copies: back to
            # compact, scaled by the homogeneous weights (counts -> w*count)
            inc = inc_ref[:]
            pair_ref[:, 0:1] = jnp.sum(inc[:, :_CHAINS], axis=1,
                                       keepdims=True)
            pair_ref[:, 1:2] = jnp.sum(inc[:, _CHAINS:], axis=1,
                                       keepdims=True)
            rows2 = pair_ref[:].T                            # (2, num)
            for r in range(R):
                ince_c_ref[r:r + 1, :] = \
                    w_e * rows2[0:1, r * 128:(r + 1) * 128]
                inci_c_ref[r:r + 1, :] = \
                    w_i * rows2[1:2, r * 128:(r + 1) * 128]

            ge_ref[:] = ge + ince_c_ref[:]
            gi_ref[:] = gi + inci_c_ref[:]
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sim = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 5,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((R, _BLOCK), jnp.int32),            # spike flags
            pltpu.VMEM((num, 2 * _CHAINS), jnp.float32),   # e+i chain columns
            pltpu.VMEM((num, 2), jnp.float32),             # (e, i) column pair
            pltpu.VMEM((R, _BLOCK), jnp.float32),          # inc_e compact
            pltpu.VMEM((R, _BLOCK), jnp.float32),          # inc_i compact
            pltpu.VMEM((R, 1), jnp.int32),                 # per-block gates
            pltpu.VMEM((R, _BLOCK // 8), jnp.int32),       # per-sub gates
        ],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    conn = jnp.pad(net.conn_all, ((0, pad), (0, 0)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        conn.reshape(num // _BLOCK, _BLOCK, n_conn)
        .transpose(0, 2, 1).reshape(-1, _BLOCK),
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_dense(net, state, n_steps: int, inp: float = 20.0,
                           platform=None):
    """Whole-simulation kernel with DENSE MXU spike propagation.

    At VMEM-resident sizes the systolic array is so much faster than any
    serialized event walk that the dense formulation wins outright: the
    fixed-fan-in table becomes one ``(num, num)`` connection-count matrix
    (bf16 — counts are small integers, so exact), and each step's
    propagation is a single ``(2, num) @ (num, num)`` contraction — row 0
    the excitatory spike mask, row 1 the inhibitory — yielding both
    channels' hit counts at once, scaled by the homogeneous weights
    afterwards (identical integer->f32 contract as ``EINet._propagate``).
    No scalar-unit work, no event collection: per-step cost is the MXU
    streaming the table (~2 us at 4k), independent of firing rate.

    All neuron state is kept as ``(1, num)`` lane-major rows, carried as
    ``fori_loop`` values. Requires ``2 * num**2`` bytes of VMEM for the
    table, so this strategy caps at ~6k neurons; beyond that use the
    event-driven strategies or the sharded model.
    """
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    table_bytes = num * num * 2
    state_bytes = 16 * num * 4
    if table_bytes + state_bytes > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'dense table ({table_bytes/1e6:.1f} MB bf16) exceeds the VMEM '
            f'budget; use the event-driven strategies for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba
    n_exc = net.n_exc

    # (num, num) connection counts: W[i, j] = multiplicity of edge i -> j.
    conn_np = np.asarray(net.conn_all)
    w_cnt = np.zeros((num, num), np.float32)
    np.add.at(w_cnt, (np.repeat(np.arange(true_num), n_conn),
                      conn_np.reshape(-1)), 1.0)
    w_cnt = jnp.asarray(w_cnt, jnp.bfloat16)

    def kernel(w_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_out, tl_out, ge_out, gi_out, cnt_out):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, num), 1)
        exc = lane < n_exc

        def step(it, carry):
            v, tl, ge, gi, cnt = carry
            t = it.astype(jnp.float32) * dt
            ge = ge * decay_e
            gi = gi * decay_i
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v = jnp.where(spike, p.v_reset, v)
            tl = jnp.where(spike, t, tl)
            cnt = cnt + spike.astype(jnp.int32)

            spk2 = jnp.concatenate(
                [jnp.where(spike & exc, 1.0, 0.0),
                 jnp.where(spike & ~exc, 1.0, 0.0)]).astype(jnp.bfloat16)
            hits = jnp.dot(spk2, w_ref[:],
                           preferred_element_type=jnp.float32)  # (2, num)
            ge = ge + w_e * hits[0:1, :]
            gi = gi + w_i * hits[1:2, :]
            return (v, tl, ge, gi, cnt)

        out = jax.lax.fori_loop(
            0, n_steps, step,
            (v0_ref[:], tl0_ref[:], ge0_ref[:], gi0_ref[:],
             jnp.zeros((1, num), jnp.int32)))
        v_out[:], tl_out[:], ge_out[:], gi_out[:], cnt_out[:] = out

    row = lambda dtype: jax.ShapeDtypeStruct((1, num), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sim = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 5,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(row(jnp.float32), row(jnp.float32), row(jnp.float32),
                   row(jnp.float32), row(jnp.int32)),
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    pad_r = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(1, num)
    out = sim(w_cnt,
              pad_r(state.neurons.v, p.v_rest),
              pad_r(state.neurons.t_last, 1e30),
              pad_r(state.g_e, 0.0),
              pad_r(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_mxu3(net, state, n_steps: int, inp: float = 20.0,
                          platform=None, *, mask_dtype=None,
                          operands: str = 'concat', pack: bool = True,
                          two_stage: bool = True, table_space: str = 'auto',
                          cap_divisor: int = 448,
                          factors: str = 'auto'):
    # NOTE: ``factors='fori'`` — see einet_pallas_sim_mxu5's docstring —
    # one in-kernel transpose per round + a dynamic column loop replaces
    # the ~2*n_conn statically-unrolled factor builds (the Mosaic compile
    # driver at 400k); same math. 'auto' picks fori at num >= 200k where
    # it wins on BOTH axes on the v5e (400k: 351.6 vs 408 us/step,
    # compile 78 s vs 817-1574 s) and unrolled below the crossover
    # (4k: 4.99 vs 13.3 us/step; see BENCH_NOTES.md "factors='fori'").
    """mxu2 with two-stage compaction and mantissa-packed one-hot factors.

    Three optimizations over :func:`einet_pallas_sim_mxu2`, each attacking
    one of its measured 40k cost terms (BENCH_NOTES.md):

    1. **Two-stage id compaction** (was ~10 us of 128 static lane-compares
       over ``(R, cap)``): stage 1 extracts, for each in-block spike rank
       ``j < J``, the spiking-neuron id per block with a ``(R, 128)``
       compare + lane-reduce; stage 2 scatters those ``(R, J)`` local ids
       to their global slots with ``J`` cheap ``(R, cap)`` compares.
       VPU element-ops drop from ``128*R*cap`` to ``J*R*(128 + cap)``.
       Blocks with more than ``J`` spikes are handled exactly by extra
       rank-window rounds (``lrounds = ceil(max_row_spikes / J)``).
    2. **Mantissa-packed block one-hot**: three consecutive block-rows
       share one f32 accumulator lane as 8-bit fields — the one-hot value
       is ``2^(8 * (hi // R3))`` at packed column ``hi % R3`` (both exact
       in bf16), so the stacked factor narrows from ``2R`` to ``2*ceil(R/3)``
       lanes and the MXU contraction FLOPs drop 3x. Exact while per-target
       per-channel per-step hit counts stay < 256 (checked against the
       table's max in-degree at build time; falls back to mxu2 otherwise)
       since the f32 accumulator holds 3 exact 8-bit fields < 2^24.
    3. **bf16 factors built directly into scratch** (no concatenate
       temporaries): halves mask-build store traffic; the MXU runs its
       native single bf16 pass (the values are power-of-two-exact).

    Same count-then-scale contract, overflow rounds, and bit-exactness vs
    ``EINet.step`` as mxu2. Replaces the role of the reference's hybrid
    scatter kernels (``/root/reference/brainevent/_csr/binary_csrmv_hybrid
    .cu``) with an all-vectorized formulation.
    """
    true_num = net.num
    factors_mode = factors
    if factors_mode == 'auto':
        factors_mode = 'fori' if true_num >= 200_000 else 'unrolled'
    n_conn = net.conn_all.shape[1]
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    if mask_dtype is None:
        # measured crossover (BENCH_NOTES.md): f32 factor builds win up to
        # 16k (4k: 4.86 vs 5.44; 16k: 6.04 vs 6.65 us/step), bf16 wins at
        # scale (40k: 16.3 vs 35.1)
        mask_dtype = jnp.float32 if num <= 20480 else jnp.bfloat16
    R = num // _BLOCK
    R3 = -(-R // 3) if pack else R
    W2 = 2 * R3                       # stacked packed one-hot width
    J = 4                             # per-block compaction ranks per pass
    # multiple of 32: scratch-buffer sublane offsets must respect the bf16
    # (16, 128) tile granularity. cap_divisor trades fixed MXU-phase cost
    # (lower cap) against extra exact overflow rounds under bursts;
    # measured at 40k: 224/320/448/640 -> 20.9/15.7/15.3/16.6 us/step
    # (the max(64, .) floor makes <=28k nets insensitive).
    cap = max(64, (-(-num // cap_divisor) + 31) // 32 * 32)
    # synapse columns per MXU contraction: largest divisor of n_conn whose
    # stacked event axis stays within one chunk
    kg = max(d for d in range(1, n_conn + 1)
             if n_conn % d == 0 and d * cap <= _MXU_CHUNK)

    # 8-bit field exactness: a target's per-channel hits in one step are
    # bounded by its per-channel in-degree, which must stay < 256.
    conn_np = np.asarray(net.conn_all)
    n_exc = net.n_exc
    deg_e = np.bincount(conn_np[:n_exc].reshape(-1), minlength=num).max()
    deg_i = np.bincount(conn_np[n_exc:].reshape(-1), minlength=num).max() \
        if conn_np.shape[0] > n_exc else 0
    if pack and max(int(deg_e), int(deg_i)) > 255:
        return einet_pallas_sim_mxu2(net, state, n_steps, inp, platform)

    # VMEM windows pad the lane axis to 128 (measured: the s32 (200064, 80)
    # table windows as 97.69 MB, not 64 — 128/80 padding), and Mosaic
    # spills loop-live (R, 128) vector values to scoped VMEM (~46 MB of
    # spill slots at R=1563). Account both or the auto mode OOMs at 200k.
    lane_rows = -(-n_conn // _BLOCK) * _BLOCK
    table_bytes = num * lane_rows * 4
    scratch_bytes = (kg * cap * (W2 + _BLOCK) * 2      # bf16 factor buffers
                     + cap * lane_rows * 4 + W2 * _BLOCK * 4)
    state_bytes = 16 * num * 4
    spill_bytes = 32 * num * 4          # ~32 loop-live (R,128) f32 values
    if table_space == 'auto':
        table_space = ('vmem' if (table_bytes + scratch_bytes + state_bytes
                                  + spill_bytes) <= _VMEM_LIMIT_BYTES
                       else 'hbm')
    vmem_table = table_bytes if table_space == 'vmem' else 0
    footprint = vmem_table + scratch_bytes + state_bytes + spill_bytes
    if footprint > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({footprint/1e6:.1f} '
            f'MB) exceeds the budget; use the sharded model for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba

    def kernel(connr_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               idscol_ref, rowbuf_ref, m2buf_ref, m1buf_ref, inc2p_ref,
               rowbufT_ref, *maybe_dmasem):
        dmasem_ref = maybe_dmasem[0] if maybe_dmasem else None
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        from ..fcn.pallas_kernels import _exclusive_block_offsets
        exc_mask = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                    * _BLOCK
                    + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                    ) < n_exc
        uppr = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
                ).astype(jnp.float32)
        cap_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cap), 1).astype(jnp.float32)
        ecol = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        w2iota = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
        idmat = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                 * _BLOCK
                 + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                 + 1).astype(jnp.float32)       # +1: 0 marks empty slots

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            # ---- position map (as mxu2; chunked offsets at large R) ------
            spk_f = spike.astype(jnp.float32)                     # (R, 128)
            rowsum = jnp.sum(spk_f, axis=1, keepdims=True)        # (R, 1)
            offs = _exclusive_block_offsets(rowsum, R)            # (R, 1)
            prefix = jax.lax.dot_general(
                spk_f, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (R, 128)
            n_act = jnp.sum(spk_f).astype(jnp.int32)
            n_e = jnp.sum(jnp.where(spike & exc_mask, 1, 0)
                          ).astype(jnp.int32)
            maxrow = jnp.max(rowsum).astype(jnp.int32)
            lrounds = (maxrow + J - 1) // J

            inc2p_ref[:] = jnp.zeros_like(inc2p_ref)
            rounds = (n_act + cap - 1) // cap

            def one_round(r, _):
                shift = (r * cap).astype(jnp.float32)

                if two_stage:
                    # ---- two-stage id compaction ---------------------
                    def lpass(lr, ids_row):
                        for j in range(J):
                            rank = (lr * J + j).astype(jnp.float32)
                            hit = (prefix == rank) & spike        # (R, 128)
                            blkid = jnp.sum(jnp.where(hit, idmat, 0.0),
                                            axis=1, keepdims=True)  # (R, 1)
                            take = (offs + rank - shift) == cap_iota
                            ids_row = ids_row + jnp.sum(
                                jnp.where(take, blkid, 0.0),
                                axis=0, keepdims=True)
                        return ids_row

                    ids_row = jax.lax.fori_loop(
                        0, lrounds, lpass, jnp.zeros((1, cap), jnp.float32))
                else:
                    # ---- flat per-lane compaction (as mxu2) ----------
                    pos = jnp.where(spike, offs + prefix, -1.0)
                    ids_row = jnp.zeros((1, cap), jnp.float32)
                    for lane in range(_BLOCK):
                        hit = pos[:, lane:lane + 1] == (cap_iota + shift)
                        ids_row = ids_row + jnp.sum(
                            jnp.where(hit, idmat[:, lane:lane + 1], 0.0),
                            axis=0, keepdims=True)
                idscol_ref[:] = ids_row.T                         # (cap, 1)

                cnt_r = jnp.minimum(n_act - r * cap, cap)
                ne_r = jnp.clip(n_e - r * cap, 0, cnt_r)

                # ---- target collection (one row copy per event) ------
                if table_space == 'vmem':
                    def gather(g, _):
                        for j in range(8):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            rowbuf_ref[pl.ds(e, 1), :] = \
                                connr_ref[pl.ds(nid, 1), :]
                        return 0
                else:
                    # HBM-resident table: 8 outstanding async row DMAs
                    def gather(g, _):
                        def copy(j):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            return pltpu.make_async_copy(
                                connr_ref.at[pl.ds(nid, 1), :],
                                rowbuf_ref.at[pl.ds(e, 1), :],
                                dmasem_ref.at[j])
                        cps = [copy(j) for j in range(8)]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return 0

                jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                # ---- packed stacked one-hot contraction --------------
                valid = ecol < cnt_r                              # (cap, 1)
                is_inh = (ecol >= ne_r).astype(jnp.int32)         # (cap, 1)

                if factors_mode == 'fori':
                    # one transpose per round + a DYNAMIC column loop:
                    # ~n_conn-fold smaller program (see mxu5's docstring).
                    # f32 values: ids < 2^24 exact; int32 transpose loads
                    # hit a Mosaic internal error.
                    rowbufT_ref[:, :] = jnp.swapaxes(
                        rowbuf_ref[:], 0, 1).astype(jnp.float32)
                    ecolr = jax.lax.broadcasted_iota(
                        jnp.int32, (1, cap), 1)
                    validr = ecolr < cnt_r                        # (1, cap)
                    is_inh_r = (ecolr >= ne_r).astype(jnp.int32)
                    w2col = jax.lax.broadcasted_iota(
                        jnp.int32, (W2, 1), 0)
                    lanecol = jax.lax.broadcasted_iota(
                        jnp.int32, (_BLOCK, 1), 0)

                    def kfun(k, _):
                        tgt = rowbufT_ref[pl.ds(k, 1), :].astype(
                            jnp.int32)
                        hi = tgt // _BLOCK
                        col = hi % R3 + R3 * is_inh_r
                        if pack:
                            fld = hi // R3
                            val = jnp.where(
                                validr,
                                jnp.where(fld == 0, 1.0,
                                          jnp.where(fld == 1, 256.0,
                                                    65536.0)),
                                0.0).astype(mask_dtype)            # (1, cap)
                        else:
                            val = jnp.where(validr, 1.0,
                                            0.0).astype(mask_dtype)
                        m2 = (col == w2col).astype(mask_dtype) * val
                        m1 = (tgt % _BLOCK == lanecol).astype(mask_dtype)
                        inc2p_ref[:] = inc2p_ref[:] + jax.lax.dot_general(
                            m2, m1,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        return 0

                    jax.lax.fori_loop(0, n_conn, kfun, 0)
                    return 0

                def factors(k):
                    tgt = rowbuf_ref[:, k:k + 1]                  # (cap, 1)
                    hi = tgt // _BLOCK
                    col = hi % R3 + R3 * is_inh
                    if pack:
                        f = hi // R3
                        val = jnp.where(
                            valid,
                            jnp.where(f == 0, 1.0,
                                      jnp.where(f == 1, 256.0, 65536.0)),
                            0.0).astype(mask_dtype)               # (cap, 1)
                    else:
                        val = jnp.where(valid, 1.0, 0.0).astype(mask_dtype)
                    m2 = (col == w2iota).astype(mask_dtype) * val
                    m1 = (tgt % _BLOCK == lane128).astype(mask_dtype)
                    return m2, m1

                for k0 in range(0, n_conn, kg):
                    if operands == 'scratch':
                        for kk in range(kg):
                            m2, m1 = factors(k0 + kk)
                            m2buf_ref[kk * cap:(kk + 1) * cap, :] = m2
                            m1buf_ref[kk * cap:(kk + 1) * cap, :] = m1
                        a2, a1 = m2buf_ref[:], m1buf_ref[:]
                    else:
                        m2s, m1s = zip(*(factors(k0 + kk)
                                         for kk in range(kg)))
                        a2 = jnp.concatenate(m2s, axis=0)
                        a1 = jnp.concatenate(m1s, axis=0)
                    inc2p_ref[:] = inc2p_ref[:] + jax.lax.dot_general(
                        a2, a1,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

            # ---- unpack the three 8-bit fields per channel ----------------
            def unpack(x):                                        # (R3, 128)
                if not pack:
                    return x
                f2 = jnp.floor(x * (1.0 / 65536.0))
                rem = x - f2 * 65536.0
                f1 = jnp.floor(rem * (1.0 / 256.0))
                f0 = rem - f1 * 256.0
                return jnp.concatenate([f0, f1, f2], axis=0)[0:R]

            ge_ref[:] = ge + w_e * unpack(inc2p_ref[0:R3, :])
            gi_ref[:] = gi + w_i * unpack(inc2p_ref[R3:W2, :])
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    table_spec = (vmem() if table_space == 'vmem'
                  else pl.BlockSpec(memory_space=pltpu.ANY))
    scratch = [
        pltpu.VMEM((cap, 1), jnp.float32),        # compacted ids column
        pltpu.VMEM((cap, lane_rows), jnp.int32),  # gathered target rows
        pltpu.VMEM((kg * cap, W2), mask_dtype),       # packed block factor
        pltpu.VMEM((kg * cap, _BLOCK), mask_dtype),   # lane factor
        pltpu.VMEM((W2, _BLOCK), jnp.float32),    # packed increments
        pltpu.VMEM((lane_rows, cap), jnp.float32),  # transposed rows (fori)
    ]
    if table_space == 'hbm':
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
    sim = pl.pallas_call(
        kernel,
        in_specs=[table_spec] + [vmem()] * 4,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=scratch,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    # synapse axis padded to the 128-lane tile: VMEM windows pad it anyway,
    # and HBM->VMEM row DMAs REQUIRE the minor dim aligned to 128 (Mosaic:
    # 'Slice shape along dimension 1 must be aligned to tiling'). The
    # factors loop only reads columns [0, n_conn), so pad values are inert.
    conn = jnp.pad(net.conn_all, ((0, pad), (0, lane_rows - n_conn)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        conn.astype(jnp.int32),                      # row-major (num, n_conn)
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def _partition_table(conn_np: np.ndarray, span: int, n_part: int,
                     group: int, align: 'int | None' = None):
    """Bucket each neuron's targets by ``span``-sized output partition.

    Returns ``(table, pmap, offs)``: ``table`` is ``(n_rows, cols)`` int32
    whose row ``i`` holds neuron ``i``'s targets as partition-LOCAL ids
    (``tgt - p * span``) laid out in ``n_part`` fixed-width segments
    (segment widths = per-partition max counts rounded up to ``align``,
    default ``group``; empty slots are ``-1``); ``pmap[g]`` is the
    partition of column group ``g``; ``offs[p]`` the first column of
    partition ``p``.
    """
    align = group if align is None else align
    n_rows, n_conn = conn_np.shape
    conn64 = conn_np.astype(np.int64)
    part = conn64 // span                                  # (n_rows, n_conn)
    order = np.argsort(part, axis=1, kind='stable')
    psort = np.take_along_axis(part, order, 1)
    tsort = np.take_along_axis(conn64, order, 1)
    counts = np.bincount(
        (part + n_part * np.arange(n_rows)[:, None]).ravel(),
        minlength=n_rows * n_part).reshape(n_rows, n_part)
    d = counts.max(axis=0)                                 # (n_part,)
    d = -(-d // align) * align                             # align segments
    offs = np.concatenate([[0], np.cumsum(d)]).astype(np.int64)
    starts = np.concatenate(
        [np.zeros((n_rows, 1), np.int64),
         np.cumsum(counts, axis=1)[:, :-1]], axis=1)       # (n_rows, n_part)
    within = (np.arange(n_conn)[None, :]
              - np.take_along_axis(starts, psort, 1))
    dest = offs[psort] + within
    table = np.full((n_rows, int(offs[-1])), -1, np.int32)
    np.put_along_axis(table, dest,
                      (tsort - psort * span).astype(np.int64), axis=1)
    pmap = np.repeat(np.arange(n_part), d // group).astype(np.int32)
    return table, pmap, offs


def _partition_table_cg(conn_np: np.ndarray, span: int, n_part: int,
                        group: int):
    """C-group variant of :func:`_partition_table` for the event-major
    single-DMA gather.

    The flat table row of neuron ``i`` is split across ``lr`` consecutive
    128-lane rows so that ONE contiguous ``(lr, 128)`` HBM DMA fetches the
    whole row (the row-major layout needs ``lr`` separate row DMAs — the
    dominant per-event cost at 400k). Slot ``s`` of the logical row lives
    at flat row ``i*lr + s % lr``, lane ``s // lr``: a transposed
    contiguous 128-row chunk then has ONE c-group (= ``lr`` consecutive
    slots, all in the same partition because segment widths are aligned
    to ``lr*group``) per row, so the factor phase's per-column-group
    partition map stays well-defined.

    Returns ``(padded, pmap_cg, lr, cols_raw)``: ``padded`` is
    ``(n_rows, lr*128)`` in LOGICAL slot order (permute with
    ``padded.reshape(-1, 128, lr).transpose(0, 2, 1)`` for the flat
    layout); ``pmap_cg[g]`` maps the transposed row group ``g`` (row
    order ``k*128 + c`` per event block) to its partition; ``cols_raw``
    is the live (pre-128-rounding) slot width — flat columns at or past
    ``ceil(cols_raw/lr)`` are ``-1`` for EVERY neuron, so the factor
    loop skips their column groups statically.
    """
    if 128 % group:
        raise ValueError('gather="block" needs group dividing 128')
    lr = 1
    while True:
        table, _, offs = _partition_table(conn_np, span, n_part, group,
                                          align=lr * group)
        if table.shape[1] <= lr * _BLOCK:
            break
        lr = -(-table.shape[1] // _BLOCK)
    cols = table.shape[1]
    padded = np.full((table.shape[0], lr * _BLOCK), -1, np.int32)
    padded[:, :cols] = table

    # ---- depth-major c-group permutation (round-5 dead-tail skip) ----
    # Reorder the lane blocks (c-groups) so their min slot depth WITHIN
    # their partition is non-decreasing: neurons pack targets into their
    # segment's first `cnt` slots, so a step whose round-max filled
    # depth is `maxd` has every c-group past the depth-`maxd` PREFIX
    # provably all -1 — the factor sweep truncates to a dynamic prefix
    # bound with zero per-iteration cost (the group-level lax.cond
    # variant measured 154 -> 268 us/step at 400k: cond acc spills).
    cpg = _BLOCK // group
    glr = lr * group
    units = (np.diff(offs) // glr).astype(np.int64)       # k-units per part
    ks = (offs[:-1] // glr).astype(np.int64)
    max_t = int(units.max()) if units.size else 0
    perm_k = [int(ks[p] + t) for t in range(max_t)
              for p in range(len(units)) if units[p] > t]
    used = set(perm_k)
    perm_k += [k for k in range(cpg) if k not in used]     # global pad tail
    perm_k = np.asarray(perm_k, np.int64)
    lane_perm = (perm_k[:, None] * group
                 + np.arange(group)[None, :]).reshape(-1)
    sl = padded.reshape(padded.shape[0], _BLOCK, lr)       # [lambda][t]
    padded = sl[:, lane_perm, :].reshape(padded.shape[0], lr * _BLOCK)

    # partition of ORIGINAL c-group k, then permuted
    base_old = np.zeros(cpg, np.int32)
    for k in range(cpg):
        s0 = k * glr
        if s0 < cols:
            base_old[k] = np.searchsorted(offs, s0, 'right') - 1
    base = base_old[perm_k]
    pmap_cg = np.tile(base, lr)      # row order k*128 + c per event block

    # static depth metadata for the runtime prefix bound:
    # t_of_k[k'] = depth unit of permuted c-group k' (pad tail = max_t);
    # cnt_per_t[t] = number of live c-groups at depth unit t.
    t_of_k = np.full(cpg, max_t, np.int64)
    for kp, k in enumerate(perm_k):
        p = base_old[k]
        if k * glr < cols and units[p] > 0:
            t = k - ks[p]
            if 0 <= t < units[p]:
                t_of_k[kp] = t
    cnt_per_t = np.asarray([(units > t).sum() for t in range(max_t)],
                           np.int64)
    # per transposed-row depth+1 (for the round max): row rho = c*128 + r
    # holds slot lambda'=r, t_row=c: depth = (t(k')*group + r%group)*lr+c;
    # pad rows get a sentinel larger than any real depth so garbage
    # lanes can only loosen (never break) the bound.
    depth_rows = np.empty(lr * _BLOCK, np.float32)
    for c in range(lr):
        for r in range(_BLOCK):
            kp = r // group
            t = int(t_of_k[kp])
            if t >= max_t:
                depth_rows[c * _BLOCK + r] = float(max_t * glr + glr)
            else:
                depth_rows[c * _BLOCK + r] = float(
                    (t * group + r % group) * lr + c)
    meta = {'cnt_per_t': cnt_per_t, 'depth_rows': depth_rows,
            'glr': glr, 'max_t': max_t}
    return padded, pmap_cg, lr, cols, meta


def _encode_slots(table_np: np.ndarray, r3p: int, n_exc: int,
                  radix: int = 3) -> np.ndarray:
    """Bake the factor phase's per-slot decode into the table entries.

    A raw slot holds the partition-LOCAL target id ``tgt``; the kernel
    needs ``lane = tgt % 128``, packed-field index ``fld = (tgt//128) //
    r3p`` and one-hot row ``col = (tgt//128) % r3p + r3p*is_inh`` — and
    ``is_inh`` (the E/I class of the SOURCE neuron, i.e. of the table
    ROW) is static, so all three bake at build time into

        ``enc = (col*4 + fld)*128 + lane``    (empty slots stay ``-1``).

    Runtime decode is then 3 whole-block vector ops (``%128``, ``//128``,
    ``%4 / //4``) instead of per-slot div/mod chains plus a runtime
    ``is_inh`` compare, and — because compaction orders events E-first —
    pure-E/pure-I event blocks can contract HALF-height one-hots
    (``col < r3p`` for E rows, ``>= r3p`` for I). f32-exactness of the
    transposed loads needs ``enc < 2^24``, i.e. ``r3p <= 16384``.

    ``radix`` > 3 (6 or 12) packs the partition's blocks into
    ``ch_n = radix/3`` accumulator CHANNELS of ``rh = rpb/radix`` one-hot
    rows each, nested INSIDE the class bands (acc row = ``class*r3p +
    ch*rh + c``), so ``W2p``, the dot shapes, and this function's
    ``(col*4 + fld)`` bit layout are all unchanged — only the col->block
    mapping moves. The factor phase exploits it by building ONE rh-row
    equality reused across channel bands (``make_masks``), cutting the
    mask build ~17%/25% at radix 6/12 (BENCH_NOTES r4c).
    """
    if 1024 * r3p > (1 << 24):
        raise ValueError('rpb too large for f32-exact slot encoding')
    if radix % 3 or (3 * r3p) % radix:
        raise ValueError(f'radix must be 3*2^k dividing rpb, got {radix}')
    ch_n = radix // 3
    rh = (3 * r3p) // radix
    t = table_np.astype(np.int64)
    hi = t >> 7
    is_inh = (np.arange(table_np.shape[0]) >= n_exc).astype(np.int64)
    q = hi // rh                      # [0, radix)
    ch = q % ch_n
    fld = q // ch_n                   # [0, 3) — the 8-bit field, as before
    col = hi % rh + rh * ch + r3p * is_inh[:, None]
    enc = ((col * 4 + fld) << 7) | (t & 127)
    return np.where(t >= 0, enc, -1).astype(np.int32)


def _factor_plan(cgs, u_t):
    """Split a sorted c-group index list into ``u_t``-wide bodies of
    CONTIGUOUS c-groups (wide-load eligible) plus leftover singles."""
    bodies, singles = [], []
    i = 0
    while i < len(cgs):
        run = 1
        while i + run < len(cgs) and cgs[i + run] == cgs[i] + run:
            run += 1
        j = 0
        while u_t > 1 and j + u_t <= run:
            bodies.append(cgs[i + j])
            j += u_t
        singles.extend(cgs[i + j:i + run])
        i += run
    return bodies, singles


def _auto_radix(num: int, rpb: int) -> int:
    """Largest channel radix the (possibly clamped) rpb supports.

    Measured at 400k/rpb=384 on a v5e (BENCH_NOTES r4c, same-day):
    radix 12 at 153.3 us/step and radix 6 at 153.8 vs the radix-3
    control's 164.1 (-6.6%), spike-count chain identical. At small nets
    the clamped rpb is odd (e.g. 315 at 40k) and only 3 divides it —
    auto degrades rather than erroring.
    """
    R = (num + _BLOCK - 1) // _BLOCK
    rpb_eff = min(rpb, -(-R // 3) * 3)
    for r in (12, 6, 3):
        if rpb_eff % r == 0:
            return r
    return 3


def _table_cache_dir():
    """Directory of the partitioned-table disk cache (the host-side analog
    of the persistent XLA compile cache: building + slot-encoding the
    400k table costs ~2 min of NumPy per process, and the result is a
    pure function of the connectivity bytes + layout knobs).

    ``BRAINEVENT_TABLE_CACHE``: unset -> default cache dir; a path ->
    that dir; '0'/'off' -> disabled (returns None)."""
    import os
    raw = os.environ.get('BRAINEVENT_TABLE_CACHE')
    if raw is not None and raw.strip().lower() in ('', '0', 'off', 'false',
                                                   'none'):
        return None
    d = raw if raw else os.path.join(os.path.expanduser('~'), '.cache',
                                     'brainevent_tpu', 'conn_tables')
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    return d


_TABLE_CACHE_MIN_ELEMS = 1 << 22   # cache only large (minutes-to-build) nets


def _mxu6_layout(net, rpb: int, group: int, gather: str = 'rows',
                 radix: int = 3):
    """Shared layout math for mxu6 (engine + table-precompute helper).

    ``gather='rows'``: tile-major flat table, ``lr`` row DMAs per event.
    ``gather='block'``: c-group flat table (:func:`_partition_table_cg`),
    ONE ``(lr, 128)`` DMA per event; ``table_np`` is returned in LOGICAL
    slot order and ``cols == lane_rows == lr*128``. Slot values are
    pre-decoded (:func:`_encode_slots`), not raw target ids.

    The 10th field ``cols_raw`` is the live slot width before any
    128-rounding: in cg mode flat columns >= ``ceil(cols_raw/lr)`` are
    ``-1`` for every neuron and the factor loop skips their groups.
    """
    true_num = net.num
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    R = num // _BLOCK
    rpb = min(rpb, -(-R // 3) * 3)
    P = -(-R // rpb)
    span = rpb * _BLOCK

    conn_np = np.asarray(net.conn_all)
    cache_dir = (_table_cache_dir()
                 if conn_np.size >= _TABLE_CACHE_MIN_ELEMS else None)
    cache_path = None
    if cache_dir is not None:
        import hashlib
        import os
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(conn_np).tobytes())
        h.update(repr(('mxu6_layout_v2', conn_np.shape, str(conn_np.dtype),
                       num, net.n_exc, rpb, group, gather, radix,
                       P, span)).encode())
        cache_path = os.path.join(cache_dir, h.hexdigest()[:32] + '.npz')
        if os.path.exists(cache_path):
            z = np.load(cache_path)
            meta = None
            if 'depth_rows' in z:
                meta = {'cnt_per_t': z['cnt_per_t'],
                        'depth_rows': z['depth_rows'],
                        'glr': int(z['glr']), 'max_t': int(z['max_t'])}
            return (num, R, rpb, P, span, z['table'], z['pmap'],
                    int(z['cols']), int(z['lane_rows']),
                    int(z['cols_raw']), meta)

    if gather == 'block':
        table_np, pmap_np, lr, cols_raw, meta = _partition_table_cg(
            conn_np, span, P, group)
        cols = lane_rows = lr * _BLOCK
    else:
        table_np, pmap_np, offs = _partition_table(
            conn_np, span, P, group)
        cols = cols_raw = table_np.shape[1]
        lane_rows = -(-cols // _BLOCK) * _BLOCK
        meta = None
    table_np = _encode_slots(table_np, rpb // 3, net.n_exc, radix=radix)
    if cache_path is not None:
        import os
        # np.savez appends '.npz' unless the name already ends in it
        tmp = cache_path + f'.tmp{os.getpid()}.npz'
        try:
            extra = ({} if meta is None else
                     dict(cnt_per_t=meta['cnt_per_t'],
                          depth_rows=meta['depth_rows'],
                          glr=meta['glr'], max_t=meta['max_t']))
            np.savez(tmp, table=table_np, pmap=pmap_np, cols=cols,
                     lane_rows=lane_rows, cols_raw=cols_raw, **extra)
            os.replace(tmp, cache_path)
        except OSError:
            pass
    return (num, R, rpb, P, span, table_np, pmap_np, cols, lane_rows,
            cols_raw, meta)


def mxu6_conn_table(net, *, rpb: int = 384, group: int = 4,
                    gather: str = 'block',
                    radix: 'int | str' = 'auto') -> jax.Array:
    """Precompute mxu6's partitioned synapse table as a device array.

    At large ``num`` the table is hundreds of MB; built inside a traced
    function it embeds as a program constant and the remote-compile relay
    rejects the request (HTTP 413 — the same trap the training consts-as-
    args API fixes).  Pass the result through your ``jax.jit`` arguments
    and hand it to :func:`einet_pallas_sim_mxu6` via ``conn_table=``.
    """
    if radix == 'auto':
        radix = _auto_radix(net.num, rpb)
    (num, _R, _rpb, _P, _span, table_np, _pmap, cols,
     lane_rows, _cols_raw, _meta) = _mxu6_layout(net, rpb, group, gather,
                                                 radix=radix)
    pad = num - net.num
    lr = lane_rows // _BLOCK
    full = jnp.pad(jnp.asarray(table_np),
                   ((0, pad), (0, lane_rows - cols)), constant_values=-1)
    if gather == 'block':
        # c-group flat layout: logical slot s of neuron nid lives at flat
        # row nid*lr + s % lr, lane s // lr — one contiguous (lr, 128)
        # DMA per event (see _partition_table_cg).
        return (full.reshape(num, _BLOCK, lr).transpose(0, 2, 1)
                .reshape(num * lr, _BLOCK).astype(jnp.int32))
    # flattened to (num * lr, 128): HBM row DMAs only compile when the
    # sliced memref is exactly one 128-lane tile wide (Mosaic rejects
    # unaligned 1-row slices of multi-tile rows: 'Slice shape along
    # dimension 0 must be aligned to tiling (8)'); row nid*lr + t holds
    # neuron nid's table columns [t*128, (t+1)*128).
    return full.reshape(num * lr, _BLOCK)


def einet_pallas_sim_mxu6(net, state, n_steps: int, inp: float = 20.0,
                          platform=None, *, mask_dtype=None,
                          table_space: str = 'auto', cap_divisor: int = 448,
                          rpb: int = 384, group: int = 4,
                          factor_unroll: int = 4, gather: str = 'block',
                          prefetch: bool = True,
                          fused_load: 'bool | int' = 2,
                          ei_split: bool = True, block_pack: int = 1,
                          m1_fuse: bool = False,
                          compact_j: 'int | None' = None,
                          compact_dot: 'bool | None' = None,
                          dead_skip: 'bool | None' = None,
                          tier_w: int = 0, radix: 'int | str' = 'auto',
                          conn_table: 'jax.Array | None' = None,
                          _ablate: tuple = ()):
    """mxu3 with a target-partitioned synapse table (two-level one-hot).

    mxu3's transpose scatter pays ``E * W2 * 128`` MXU MACs per step with
    ``W2 = 2 * ceil(R / 3)`` proportional to the WHOLE network — the
    O(E x N) roofline that dominates at 400k (~19 G MACs/step). mxu6
    breaks it by bucketing each neuron's targets **at build time** into
    ``P = ceil(R / rpb)`` partitions of ``rpb`` 128-lane blocks: the table
    row becomes ``P`` fixed-width segments (widths = per-partition max
    out-degree, ``-1`` padded), each event still costs one table-row
    fetch (``lr = lane_rows/128`` single-tile DMAs), and
    the factor phase contracts each column group against a one-hot only
    ``2 * ceil(rpb / 3)`` wide (= 256 at the tuned default ``rpb=384``,
    two MXU output tiles). MXU MACs drop from ``E * 2*ceil(R/3) * 128`` to
    ``E * cols/n_conn * 128 * 128`` — ~4.5x at 400k with the binomial
    padding tail included; factor-build VPU work drops ~2.4x.

    The factor loop is a single dynamic ``fori_loop`` over column groups
    (program size O(1) in both ``num`` and ``cols`` — the mxu3
    ``factors='fori'`` compile fix), with the per-group partition read
    from a colgroup->partition map and the ``(W2p, 128)`` accumulation
    RMW'd at a dynamic 128-aligned sublane offset. Same count-then-scale
    contract, two-stage compaction, overflow rounds, and packed-field
    exactness condition (per-channel in-degree < 256) as mxu3.

    ``prefetch=True`` (HBM table only) splits each round's event blocks
    into two banks and issues BOTH banks' row DMAs before any compute:
    bank 1's flight hides behind bank 0's transposes + contraction, so
    the DMA-count-bound gather phase costs ~its issue time only. Exact
    (integer-valued packed increments make the two per-group flushes
    associativity-free).

    The factor phase is VPU-MASK-BUILD bound, not MXU bound (~50 VPU
    cycles per slot-column vs ~0.16 MXU cycles at the tuned shape), so
    two further knobs attack the build itself:

    - slot entries are PRE-DECODED at build time (:func:`_encode_slots`):
      ``(col, fld, lane)`` plus the source neuron's static E/I class bake
      into ``enc = (col*4+fld)*128+lane``, turning the per-slot div/mod
      chain + runtime ``is_inh`` compare into 3 whole-block vector ops.
    - ``ei_split=True``: compaction orders events E-first, so all event
      blocks left of ``ne_r//128`` are pure-E (baked ``col < r3p``) and
      blocks right of ``cdiv(ne_r,128)`` pure-I — those ranges contract
      HALF-height ``(r3p, .)`` one-hots and dots (half the mask build,
      half the MXU MACs); only the <=1 mixed boundary block per round
      pays the full ``(W2p, .)`` pass.
    - ``fused_load=2`` ("wide"): ONE ``(u*group, 128)`` dynamic load per
      unroll body feeds all ``u`` chains (4x fewer dynamic loads in the
      latency-bound loop); requires ``u*group`` dividing 128.
    - ``block_pack=bp``: concatenate ``bp`` event blocks on the
      contraction axis — one ``K = bp*group*128`` dot replaces ``bp``
      dots, dividing loop trips and loop-carried accumulator
      read/writes by ``bp`` at the same VPU-build and MXU-MAC totals
      (trailing dead sub-blocks mask to zero through ``val``).
      Measured LOSS at 400k (156 -> 178/232 us/step at bp=2/4): the
      staging concat costs more than the loop overhead it saves.
    - ``m1_fuse=True`` is interpret-only: on v5e Mosaic rejects the
      fused 128x128 i1 eq-mask with an "Invalid relayout" error
      (BENCH_NOTES round 3c); default stays ``False``.
    - ``tier_w=w``: two-pass tiered scatter — events whose source
      neuron has per-partition out-degree <= w in EVERY partition
      sweep only each segment's first ``w`` slots. Measured LOSS at
      400k (157 -> 179 us/step at w=16): the c-group granularity
      (``lr*group`` = 8 slots) is too coarse against the ~28-slot
      segments (clean sweep still 2 of ~3.5 c-groups) and the second
      compaction pass costs ~25 us. Kept for layouts with fatter
      padding tails; default 0.
    - ``compact_dot``: the compaction phase's rank scatter through a
      two-level ``(hi, lo) = divmod(pos, 128)`` MXU dot — an
      ``(R, 128)`` lo one-hot carrying the block ids contracted
      against an ``(R, cap//128)`` hi one-hot — instead of the
      ``(R, cap)`` position one-hot. Exact (positions are globally
      unique, so each grid cell sums at most one nonzero id; HIGHEST
      keeps the < 2^24 ids exact). Measured same-day (ab9, v5e):
      wins at 400k/cap=896 (160.2 vs 162.1 us/step), loses at
      200k/cap=512 (71.2 vs 69.2 — the tiny-M dot's fixed per-trip
      latency outruns the VPU saving); auto = on above cap 512.

    Replaces the role of the reference's hybrid scatter kernels
    (``/root/reference/brainevent/_csr/binary_csrmv_hybrid.cu``) with a
    build-time load-bucketed, all-vectorized formulation.
    """
    true_num = net.num
    if rpb % 3:
        raise ValueError('rpb must be a multiple of 3')
    if gather not in ('rows', 'block'):
        raise ValueError(f"gather must be 'rows' or 'block', got {gather!r}")
    if radix not in (3, 6, 12, 'auto'):
        raise ValueError(f"radix must be 3, 6, 12 or 'auto', got {radix}")
    cg = gather == 'block'
    if radix == 'auto':
        radix = _auto_radix(net.num, rpb)
    (num, R, rpb, P, span, table_np, pmap_np, cols,
     lane_rows, cols_raw, depth_meta) = _mxu6_layout(net, rpb, group,
                                                     gather, radix=radix)
    if rpb % radix:
        raise ValueError(
            f'radix {radix} must divide the (possibly clamped) rpb {rpb}')
    pad = num - true_num
    if mask_dtype is None:
        mask_dtype = jnp.float32 if num <= 20480 else jnp.bfloat16
    r3p = rpb // 3
    W2p = 2 * r3p
    # radix > 3: ch_n accumulator channels of rh one-hot rows nested
    # inside each class band (see _encode_slots) — W2p and every dot
    # shape stay identical; only the m2 mask build narrows (one rh-row
    # equality shared across bands + cheap per-band val multiplies)
    ch_n = radix // 3
    rh = rpb // radix
    # compaction ranks per lpass trip: the loop runs ceil(maxrow/J)
    # trips, so J=4 wastes up to 3 full (R, cap) rank passes when the
    # per-block event max is small (maxrow ~3-4 at the 400k bench rate);
    # smaller J trades those wasted passes for more (scalar) trip
    # overhead. Measured (ab7/ab8): J=1 wins at 400k (154.5 vs 157.1),
    # ties at 200k, loses at 40k (13.3 vs 11.6) — the per-block event
    # max scales with density, so the default is size-dependent.
    if compact_j is None:
        compact_j = 1 if num >= 300_000 else 4
    J = max(1, int(compact_j))
    # cap rounds UP to a full 128-lane multiple: the factor contraction
    # runs over the lane (event) axis, and fori-mode measurements show a
    # heavy Mosaic slow path when that dim is not 128-aligned (mxu3
    # factors='fori': 346 us/step at 400k with cap=896 vs 1220 us/step at
    # 100k with cap=224).
    cap = max(128, -(-(-(-num // cap_divisor)) // 128) * 128)
    # compact_dot: two-level MXU rank scatter in the compaction phase
    # (see one_round's lpass_dot). The VPU saving scales with cap/128
    # but the tiny-M (nhi, 128) HIGHEST dot adds a fixed per-trip MXU
    # latency, so the crossover is high: measured same-day on v5e
    # (ab9), 400k/cap=896 wins 160.2 vs 162.1 us/step; 200k/cap=512
    # LOSES 71.2 vs 69.2. Auto enables it only above cap 512.
    cdot = (cap > 512) if compact_dot is None else bool(compact_dot)
    # csplit: bf16 byte-factor id dots inside the compaction rank trips
    # (exact; requires num+1 < 2**24). Measured NEUTRAL at 400k: 143.5
    # vs 143.7 us/step production, 86-87 vs ~90 at the diag rate — the
    # trips are bound by the (R, 128) mask BUILDS, not the dot passes
    # (BENCH_NOTES r5e). Default off; kept as the documented knob.
    csplit = cdot and (num + 1) < (1 << 24) and bool(
        int(os.environ.get('BRAINEVENT_COMPACT_SPLIT', '0')))
    # dead_skip: dynamic factor-sweep PREFIX bound. The cg table's
    # c-groups are depth-major-permuted at build time, so every c-group
    # whose min slot depth >= the round's max filled depth is provably
    # all -1 and the sweep truncates to ceil(n_live/u) unroll bodies —
    # zero per-iteration cost. (The per-(block, c-group) lax.cond
    # variant measured 154 -> 268 us/step at 400k: cond acc spills.)
    # None = auto: on from 100k neurons (measured v5e crossover: the
    # bound compute costs ~3% at 40k where the padding tail is thin —
    # 11.43 -> 11.84 us/step — and wins from 100k up: 26.31 -> 26.10 at
    # 100k, 154.25 -> 142.49 at 400k; BENCH_NOTES r5c/r5d).
    dskip = (num >= 100_000) if dead_skip is None else bool(dead_skip)
    dskip = dskip and cg and not tier_w and depth_meta is not None
    if dskip:
        _cnt_per_t = [int(x) for x in np.asarray(depth_meta['cnt_per_t'])]
        # k'-boundaries of each depth unit (cnt_per_t prefix sums): the
        # permutation is t-major, so t(k') is non-decreasing and the
        # in-kernel depth vector rebuilds from iota + these static ints
        _t_bounds = list(np.cumsum([0] + _cnt_per_t))
        _glr_d = int(depth_meta['glr'])
        _max_t_d = int(depth_meta['max_t'])

    # packed 8-bit field exactness: per-target per-channel in-degree < 256
    conn_np = np.asarray(net.conn_all)
    n_exc = net.n_exc
    deg_e = np.bincount(conn_np[:n_exc].reshape(-1), minlength=num).max()
    deg_i = np.bincount(conn_np[n_exc:].reshape(-1), minlength=num).max() \
        if conn_np.shape[0] > n_exc else 0
    if max(int(deg_e), int(deg_i)) > 255:
        return einet_pallas_sim_mxu2(net, state, n_steps, inp, platform)

    n_groups = cols // group
    lr = lane_rows // _BLOCK   # 128-lane tiles per table row (DMA unit)

    # ---- tier split (tier_w > 0): the binomial padding tail means the
    # per-partition segment widths (max out-degree over ALL neurons) far
    # exceed a typical neuron's needs (256 swept slots vs 80 targets at
    # 400k). Events from "clean" neurons — per-partition out-degree
    # <= tier_w in EVERY partition (~87% at 400k with tier_w=16) — sweep
    # only the first tier_w slots of each partition segment; the dirty
    # rest sweep everything. Same table, same gather; the event stream
    # splits into two masked compactions.
    tier = int(tier_w)
    u_glob = max(1, int(factor_unroll))
    if tier:
        if not cg:
            raise ValueError("tier_w requires gather='block'")
        algn = lr * group
        if tier % algn:
            raise ValueError(
                f'tier_w must be a multiple of lr*group = {algn}, got '
                f'{tier}')
        part_np = conn_np.astype(np.int64) // span
        counts_np = np.bincount(
            (part_np + P * np.arange(conn_np.shape[0])[:, None]).ravel(),
            minlength=conn_np.shape[0] * P).reshape(-1, P)
        clean_np = np.zeros((num,), np.float32)
        clean_np[:conn_np.shape[0]] = (counts_np <= tier).all(axis=1)
        # factor sweep plans in c-group units (one c-group = `group`
        # transposed rows = lr*group logical slots); plans index the SAME
        # run_groups machinery through a VMEM indirection column.
        cpg = _BLOCK // group
        live_flat = -(-cols_raw // lr)
        live_cg = min(cpg, -(-live_flat // group))
        base_pm = pmap_np[:cpg]
        twc = tier // algn
        a_cgs, b_cgs = [], []
        for c in range(lr):
            off = c * cpg
            s = 0
            while s < live_cg:
                e = s
                while e < live_cg and base_pm[e] == base_pm[s]:
                    e += 1
                a_cgs.extend(off + k for k in range(s, min(e, s + twc)))
                s = e
            b_cgs.extend(off + k for k in range(live_cg))
        u_a = max(1, min(u_glob, twc))
        tier_ab, tier_as = _factor_plan(a_cgs, u_a)
        tier_bb, tier_bs = _factor_plan(b_cgs, u_glob)
        tier_plan_np = [np.asarray(x if x else [0], np.int32).reshape(-1, 1)
                        for x in (tier_ab, tier_as, tier_bb, tier_bs)]
        tier_lens = (len(tier_ab), len(tier_as), len(tier_bb),
                     len(tier_bs))

    table_bytes = num * lane_rows * 4
    scratch_bytes = (cap * lane_rows * 8        # rowbuf i32 + rowbufT f32
                     + P * W2p * _BLOCK * 4 + cap * 4)
    state_bytes = 16 * num * 4
    spill_bytes = 32 * num * 4
    if table_space == 'auto':
        table_space = ('vmem' if (table_bytes + scratch_bytes + state_bytes
                                  + spill_bytes) <= _VMEM_LIMIT_BYTES
                       else 'hbm')
    # prefetch: banked DMA/compute overlap — only meaningful when the
    # table lives in HBM (the VMEM path has no DMAs to hide)
    pf = bool(prefetch) and table_space == 'hbm'
    nblocks = cap // _BLOCK
    vmem_table = table_bytes if table_space == 'vmem' else 0
    footprint = vmem_table + scratch_bytes + state_bytes + spill_bytes
    if footprint > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({footprint/1e6:.1f} '
            f'MB) exceeds the budget; use the sharded model for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba

    def kernel(connr_ref, pmap_ref, *refs):
        if tier:
            (cleanf_ref, abod_ref, asin_ref, bbod_ref, bsin_ref) = refs[:5]
            refs = refs[5:]
        (v0_ref, tl0_ref, ge0_ref, gi0_ref,
         v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
         idscol_ref, rowbuf_ref, rowbufT_ref, inc2p_ref,
         *maybe_dmasem) = refs
        dmasem_ref = maybe_dmasem[0] if maybe_dmasem else None
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        from ..fcn.pallas_kernels import _exclusive_block_offsets
        exc_mask = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                    * _BLOCK
                    + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                    ) < n_exc
        uppr = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
                ).astype(jnp.float32)
        cap_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cap), 1).astype(jnp.float32)
        idmat = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                 * _BLOCK
                 + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                 + 1).astype(jnp.float32)       # +1: 0 marks empty slots
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        w2col = jax.lax.broadcasted_iota(jnp.int32, (W2p, 1), 0)
        w2col_h = jax.lax.broadcasted_iota(jnp.int32, (r3p, 1), 0)
        wrhcol = jax.lax.broadcasted_iota(jnp.int32, (rh, 1), 0)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 1), 0)
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, _BLOCK), 1).astype(jnp.float32)
        hi_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cap // _BLOCK), 1).astype(jnp.float32)

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            inc2p_ref[:] = jnp.zeros_like(inc2p_ref)

            # ---- position map + two-stage compaction (as mxu3), one
            # scatter pass per event tier (sel_f masks the spike set;
            # plan routes the factor sweep) --------------------------------
            def scatter_pass(sel_f, plan):
                spk_f = spike.astype(jnp.float32)                 # (R, 128)
                if sel_f is not None:
                    spk_f = spk_f * sel_f
                spk_b = spk_f > 0.0
                rowsum = jnp.sum(spk_f, axis=1, keepdims=True)    # (R, 1)
                offs_b = _exclusive_block_offsets(rowsum, R)      # (R, 1)
                prefix = jax.lax.dot_general(
                    spk_f, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)          # (R, 128)
                n_act = jnp.sum(spk_f).astype(jnp.int32)
                n_e = jnp.sum(jnp.where(spk_b & exc_mask, 1, 0)
                              ).astype(jnp.int32)
                maxrow = jnp.max(rowsum).astype(jnp.int32)
                lrounds = (maxrow + J - 1) // J
                rounds = (n_act + cap - 1) // cap
                run_rounds(spk_b, prefix, offs_b, n_act, n_e, lrounds,
                           rounds, plan)

            def run_rounds(spk_b, prefix, offs_b, n_act, n_e, lrounds,
                           rounds, plan):

              def one_round(r, _):
                shift = (r * cap).astype(jnp.float32)

                def lpass(lr_, ids_row):
                    for j in range(J):
                        rank = (lr_ * J + j).astype(jnp.float32)
                        hit = (prefix == rank) & spk_b            # (R, 128)
                        blkid = jnp.sum(jnp.where(hit, idmat, 0.0),
                                        axis=1, keepdims=True)    # (R, 1)
                        take = (offs_b + rank - shift) == cap_iota
                        ids_row = ids_row + jnp.sum(
                            jnp.where(take, blkid, 0.0),
                            axis=0, keepdims=True)
                    return ids_row

                # compact_dot: the rank scatter above builds an (R, cap)
                # position one-hot per rank trip — the VPU-dominant term
                # of the compaction phase (~2.8M compare/select/sum
                # elements per trip at 400k). The two-level form splits
                # the position into (hi, lo) = divmod(pos, 128), builds
                # only an (R, 128) lo one-hot (carrying blkid) and an
                # (R, nhi) hi one-hot, and scatters with ONE MXU dot
                # contracting R into the (nhi, 128) id grid —
                # cap/128 x fewer VPU mask elements per trip. Exact:
                # positions are globally unique per event (disjoint
                # [offs_b, offs_b+rowsum) ranges), so every grid cell
                # sums one nonzero id at most (HIGHEST keeps the f32
                # product of the <2^24 ids exact, as the prefix dot).
                nhi = cap // _BLOCK

                def lpass_dot(lr_, ids_hl):
                    for j in range(J):
                        rank = (lr_ * J + j).astype(jnp.float32)
                        hit = (prefix == rank) & spk_b            # (R, 128)
                        blkid = jnp.sum(jnp.where(hit, idmat, 0.0),
                                        axis=1, keepdims=True)    # (R, 1)
                        x = offs_b + rank - shift                 # (R, 1)
                        hif = jnp.floor(x * (1.0 / _BLOCK))
                        lof = x - hif * float(_BLOCK)
                        oh = (hif == hi_iota).astype(jnp.bfloat16)
                        if csplit:
                            # id payload split into bf16-EXACT byte
                            # factors (each < 256; one nonzero per grid
                            # cell): three 1-pass bf16 dots replace the
                            # 6-pass HIGHEST f32 dot, cutting the trip's
                            # dominant operand traffic (r5e analysis)
                            b1 = jnp.floor(blkid * (1.0 / 256.0))
                            b0 = blkid - b1 * 256.0
                            b2 = jnp.floor(b1 * (1.0 / 256.0))
                            b1 = b1 - b2 * 256.0
                            dn = (((0,), (0,)), ((), ()))
                            onlane = lof == lane_f                # (R,128)
                            acc = jnp.zeros_like(ids_hl)
                            for scale, bk in ((65536.0, b2),
                                              (256.0, b1), (1.0, b0)):
                                mk = jnp.where(onlane, bk,
                                               0.0).astype(jnp.bfloat16)
                                acc = acc + scale * jax.lax.dot_general(
                                    oh, mk, dn,
                                    preferred_element_type=jnp.float32)
                            ids_hl = ids_hl + acc
                            continue
                        m = jnp.where(lof == lane_f, blkid, 0.0)  # (R, 128)
                        ids_hl = ids_hl + jax.lax.dot_general(
                            oh.astype(jnp.float32), m,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    return ids_hl

                # _ablate: timing-only phase knockouts for roofline
                # decomposition (results are WRONG with any phase ablated)
                if 'compact' not in _ablate:
                    if cdot:
                        ids_hl = jax.lax.fori_loop(
                            0, lrounds, lpass_dot,
                            jnp.zeros((nhi, _BLOCK), jnp.float32))
                        for h in range(nhi):
                            idscol_ref[h * _BLOCK:(h + 1) * _BLOCK, :] = \
                                ids_hl[h:h + 1, :].T
                    else:
                        ids_row = jax.lax.fori_loop(
                            0, lrounds, lpass,
                            jnp.zeros((1, cap), jnp.float32))
                        idscol_ref[:] = ids_row.T                 # (cap, 1)

                cnt_r = jnp.minimum(n_act - r * cap, cap)
                ne_r = jnp.clip(n_e - r * cap, 0, cnt_r)

                # ---- target collection (lr tile copies per event) --------
                # table rows are flattened to one 128-lane tile each
                # (row nid*lr + t); rowbuf is tile-major (lr*cap, 128) so
                # tile t's cap rows are contiguous for the transposes.
                if table_space == 'vmem':
                    def gather(g, _):
                        for j in range(8):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            for t in range(lr):
                                dst = e * lr + t if cg else t * cap + e
                                rowbuf_ref[pl.ds(dst, 1), :] = \
                                    connr_ref[pl.ds(nid * lr + t, 1), :]
                        return 0
                elif cg:
                    # event-major layout: neuron nid's whole table row is
                    # lr CONTIGUOUS flat rows -> ONE (lr, 128) DMA per
                    # event instead of lr row DMAs (the gather phase is
                    # DMA-count-bound: 209 us/step of the 708 at the 400k
                    # diag rate with lr=3)
                    def gather(g, _):
                        def copy(j):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            return pltpu.make_async_copy(
                                connr_ref.at[pl.ds(nid * lr, lr), :],
                                rowbuf_ref.at[pl.ds(e * lr, lr), :],
                                dmasem_ref.at[j])
                        cps = [copy(j) for j in range(8)]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return 0
                else:
                    def gather(g, _):
                        def copy(j, t):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            return pltpu.make_async_copy(
                                connr_ref.at[pl.ds(nid * lr + t, 1), :],
                                rowbuf_ref.at[pl.ds(t * cap + e, 1), :],
                                dmasem_ref.at[j * lr + t])
                        cps = [copy(j, t) for j in range(8)
                               for t in range(lr)]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return 0

                if not pf and 'gather' not in _ablate:
                    jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                # ---- per-partition one-hot contraction -------------------
                # f32 values: local ids < span <= 2^24 exact; int32
                # transpose loads hit a Mosaic internal error.
                #
                # factor work must scale with LIVE events, not capacity:
                # measured at 400k, raising cap 896 -> 1664 costs 211 ->
                # 262 us/step (the sweep is ~cap-proportional) and ~45% of
                # steps overflow into a second round that would pay a full
                # cap-wide pass for a handful of events. The contraction
                # therefore runs per 128-event block with a DYNAMIC trip
                # count ceil(cnt_r / 128) — lanes past cnt_r contribute
                # exactly zero through the valid mask, so skipping whole
                # blocks is bit-exact.
                #
                # rowbufT stacks the event blocks on the SUBLANE axis
                # (row b*lane_rows + t*128 + lane holds table column
                # t*128+lane of events [b*128, (b+1)*128)): a dynamic
                # lane-axis slice `[:, pl.ds(b*128, 128)]` is a Mosaic
                # "dynamic load with unaligned indices" compile error at
                # 400k, while a (1, 128) row read at a dynamic sublane
                # index is the proven slot-scan pattern
                # (jitc/pallas_kernels.py). The per-block transpose fills
                # are pl.when-gated on the same bound so they skip dead
                # blocks at runtime with static slices.
                eb_r = (cnt_r + _BLOCK - 1) // _BLOCK

                def transpose_block(b):
                    @pl.when(b * _BLOCK < cnt_r)
                    def _(b=b):
                        for t in range(lr):
                            # cg: event-major source — event block b's lr
                            # contiguous 128-row chunks (events interleave
                            # with slots inside a chunk when lr does not
                            # divide 128; the factor masks recover the
                            # event id as (t*128 + lane) // lr)
                            src = (b * _BLOCK * lr + t * _BLOCK if cg
                                   else t * cap + b * _BLOCK)
                            rowbufT_ref[
                                b * lane_rows + t * _BLOCK:
                                b * lane_rows + (t + 1) * _BLOCK, :] = \
                                jnp.swapaxes(
                                    rowbuf_ref[src:src + _BLOCK, :],
                                    0, 1).astype(jnp.float32)

                if not pf and 'transpose' not in _ablate:
                    for b in range(cap // _BLOCK):
                        transpose_block(b)

                def make_masks(g, b, blk=None, mode='full', live=None):
                    # event id of lane l: rows mode puts events on lanes
                    # directly; cg (event-major) interleaves (event, slot)
                    # as lane = eloc*lr + t within transposed chunk tk
                    if cg:
                        tk = (g * group) // _BLOCK   # group | 128: one chunk
                        eloc = (tk * _BLOCK + lane_row) // lr
                    else:
                        eloc = lane_row
                    ecol = b * _BLOCK + eloc                      # (1, 128)
                    valid_b = ecol < cnt_r
                    if live is not None:
                        # block_pack: dead trailing sub-blocks of a packed
                        # dot read a clamped (in-bounds) row and are killed
                        # here — val=0 zeroes their a1 columns exactly.
                        valid_b = valid_b & live
                    # fused_load: ONE dynamic (group, 128) sublane load per
                    # column group instead of `group` serial (1, 128) row
                    # reads — the factor iteration is load-latency-bound
                    # (~296 ns/iter at 400k vs ~85 ns of MXU work), and the
                    # group's rows are contiguous sublanes. fused_load=2
                    # ("wide") hoists further: the caller passes one
                    # (u*group, 128) load shared by the whole unroll body.
                    if blk is None and fused_load:
                        blk = rowbufT_ref[
                            pl.ds(b * lane_rows + g * group, group),
                            :].astype(jnp.int32)
                    if blk is not None:
                        # slots are pre-decoded (_encode_slots): 3 vector
                        # ops recover (col, fld, lane) for the WHOLE group
                        # at once; empty slots (-1) decode to col=-1 (no
                        # one-hot match) and val=0 (vslot) — double-killed.
                        vslot_a = blk >= 0
                        lane_a = blk & 127
                        rest = blk >> 7
                        fld_a = rest & 3
                        col_a = rest >> 2
                    m2s, m1s = [], []
                    for j in range(group):
                        if blk is not None:
                            vslot = vslot_a[j:j + 1, :]
                            lane = lane_a[j:j + 1, :]
                            fld = fld_a[j:j + 1, :]
                            col = col_a[j:j + 1, :]
                        else:
                            enc = rowbufT_ref[
                                pl.ds(b * lane_rows + g * group + j, 1),
                                :].astype(jnp.int32)
                            vslot = enc >= 0        # -1 marks empty slots
                            lane = enc & 127
                            rest = enc >> 7
                            fld = rest & 3
                            col = rest >> 2
                        val = jnp.where(
                            valid_b & vslot,
                            jnp.where(fld == 0, 1.0,
                                      jnp.where(fld == 1, 256.0,
                                                65536.0)),
                            0.0).astype(mask_dtype)               # (1, 128)
                        # The field/validity scale `val` multiplies the
                        # SMALLER one-hot side: the slot product
                        # [col==w]*val*[lane==l] is associative, and m1 is
                        # (128, 128) vs m2's (W2p, 128) — at W2p > 128 this
                        # drops (W2p-128)*128 VPU mults per slot. val=0
                        # still zeroes invalid/empty slots through the dot.
                        #
                        # mode: compaction orders events E-first, so blocks
                        # left of ne_r//128 are pure-E (col < r3p — baked
                        # source class) and blocks right of cdiv(ne_r,128)
                        # pure-I: HALF-height one-hot and dot ('E'/'I'),
                        # 'full' only for the <=1 mixed boundary block.
                        if ch_n > 1:
                            # radix > 3: ONE rh-row equality reused by
                            # every (class, channel) band; the field/
                            # validity scale AND the band membership fold
                            # into cheap (1, 128) per-band values, so the
                            # m1 side drops its val multiply entirely.
                            # Build: rh eq + n_bands*rh muls + 128 eq
                            # vs radix-3's r3p eq + 128 eq + 128 mul.
                            band = col // rh                  # (1, 128)
                            colc = col - band * rh
                            eqb = (colc == wrhcol).astype(mask_dtype)
                            if mode == 'full':
                                bands = range(2 * ch_n)
                            elif mode == 'E':
                                bands = range(ch_n)
                            else:
                                bands = range(ch_n, 2 * ch_n)
                            m2s.append(jnp.concatenate(
                                [eqb * jnp.where(band == b, val,
                                                 jnp.zeros((), mask_dtype))
                                 for b in bands], axis=0))
                            m1s.append(
                                (lane == lanecol).astype(mask_dtype))
                            continue
                        if mode == 'full':
                            m2s.append((col == w2col).astype(mask_dtype))
                        elif mode == 'E':
                            m2s.append((col == w2col_h).astype(mask_dtype))
                        else:
                            m2s.append(
                                (col == w2col_h + r3p).astype(mask_dtype))
                        if m1_fuse:
                            # single select instead of cast-then-multiply:
                            # the (128, 128) event one-hot is the widest
                            # VPU object in the build, so dropping its
                            # extra pass is a ~whole-mask-width saving.
                            m1s.append(jnp.where(
                                lane == lanecol, val,
                                jnp.zeros((), mask_dtype)))
                        else:
                            m1s.append(
                                (lane == lanecol).astype(mask_dtype) * val)
                    a2 = (m2s[0] if group == 1
                          else jnp.concatenate(m2s, axis=1))
                    a1 = (m1s[0] if group == 1
                          else jnp.concatenate(m1s, axis=1))
                    return a2, a1

                def dot_(a2, a1):
                    return jax.lax.dot_general(
                        a2, a1,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)       # (W2p,128)

                def flush(g, acc):
                    base = pmap_ref[g, 0] * W2p
                    inc2p_ref[pl.ds(base, W2p), :] = (
                        inc2p_ref[pl.ds(base, W2p), :] + acc)

                # factor_unroll > 1 processes that many column groups per
                # fori body as INDEPENDENT build->dot chains: a single
                # chain strictly serializes the VPU mask build against the
                # MXU contraction (measured ~29% MXU efficiency at 400k);
                # independent chains let the VLIW scheduler run chain
                # k+1's mask build under chain k's dot.
                u = max(1, int(factor_unroll))
                bp = max(1, int(block_pack))
                # fused_load=2: one (nch*group, 128) dynamic load feeds all
                # chains of an unroll body (4x fewer dynamic loads in the
                # latency-bound hot loop). Requires the span to stay inside
                # one transposed 128-chunk in cg mode: nch*group | 128 —
                # checked per chain_accs call (tier bodies may be narrower
                # than the global unroll).

                def run_factor(blk0, blk_hi):
                    # dead-tail prefix bound (dskip): the round's max
                    # filled slot depth over the transposed buffer — any
                    # c-group whose min depth reaches it is all -1 (the
                    # table is depth-major-permuted at build time) and
                    # the sweep below truncates to its live prefix.
                    if dskip:
                        riot = jax.lax.broadcasted_iota(
                            jnp.int32, (lane_rows, 1), 0)
                        r_l = riot % _BLOCK
                        c_l = riot // _BLOCK
                        kp_l = r_l // group
                        a_l = r_l % group
                        t_l = sum((kp_l >= b).astype(jnp.int32)
                                  for b in _t_bounds[1:_max_t_d + 1]) \
                            if _max_t_d else jnp.zeros_like(riot)
                        depth_c = ((t_l * group + a_l) * lr
                                   + c_l).astype(jnp.float32)

                        def _mdfun(b, m):
                            blk = rowbufT_ref[
                                pl.ds(b * lane_rows, lane_rows), :]
                            return jnp.maximum(m, jnp.max(jnp.where(
                                blk >= 0, depth_c + 1.0, 0.0)))

                        maxd = jax.lax.fori_loop(
                            blk0, blk_hi, _mdfun,
                            jnp.float32(0.0)).astype(jnp.int32)
                    # ei_split: compaction orders events E-first, so the
                    # block range splits into pure-E / <=1 mixed / pure-I
                    # sub-ranges; the pure ranges contract (r3p, .) dots —
                    # HALF the one-hot build and HALF the MXU MACs.
                    if ei_split:
                        bE1 = jnp.clip(ne_r // _BLOCK, blk0, blk_hi)
                        bG1 = jnp.clip(-(-ne_r // _BLOCK), bE1, blk_hi)
                        ranges = (('E', blk0, bE1), ('full', bE1, bG1),
                                  ('I', bG1, blk_hi))
                    else:
                        ranges = (('full', blk0, blk_hi),)

                    def chain_accs(i0, nch, lo, hi, mode):
                        # nch independent build->dot chains for groups
                        # [i0, i0+nch) over event blocks [lo, hi)
                        rows = W2p if mode == 'full' else r3p
                        # wide-load eligibility is per-call: tier bodies
                        # may run nch < u chains (e.g. a 2-c-group clean
                        # segment prefix) and still share one load.
                        wide_c = (int(fused_load) >= 2 and nch > 1
                                  and _BLOCK % (nch * group) == 0)

                        if bp > 1:
                            # block_pack: concatenate bp event blocks on
                            # the CONTRACTION axis — one dot of K =
                            # bp*group*128 replaces bp dots, halving (at
                            # bp=2) the loop trips and the loop-carried
                            # accumulator read/writes; same VPU build and
                            # MXU MAC totals. Trailing dead sub-blocks
                            # read a clamped row and mask to zero (live).
                            def bfun_p(t, accs):
                                per = [[] for _ in range(nch)]
                                for q in range(bp):
                                    b = lo + t * bp + q
                                    br = jnp.minimum(b, nblocks - 1)
                                    lv = b < hi
                                    if wide_c:
                                        blk_w = rowbufT_ref[
                                            pl.ds(br * lane_rows
                                                  + i0 * group,
                                                  nch * group),
                                            :].astype(jnp.int32)
                                        for k in range(nch):
                                            per[k].append(make_masks(
                                                i0 + k, b,
                                                blk_w[k * group:
                                                      (k + 1) * group],
                                                mode=mode, live=lv))
                                    else:
                                        for k in range(nch):
                                            blk_k = rowbufT_ref[
                                                pl.ds(br * lane_rows
                                                      + (i0 + k) * group,
                                                      group),
                                                :].astype(jnp.int32)
                                            per[k].append(make_masks(
                                                i0 + k, b, blk_k,
                                                mode=mode, live=lv))
                                return tuple(
                                    acc + dot_(
                                        jnp.concatenate(
                                            [p[0] for p in ps], axis=1),
                                        jnp.concatenate(
                                            [p[1] for p in ps], axis=1))
                                    for acc, ps in zip(accs, per))

                            return jax.lax.fori_loop(
                                0, (hi - lo + bp - 1) // bp, bfun_p,
                                tuple(jnp.zeros((rows, _BLOCK),
                                                jnp.float32)
                                      for _ in range(nch)))

                        def bfun(b, accs):
                            if wide_c:
                                blk_w = rowbufT_ref[
                                    pl.ds(b * lane_rows + i0 * group,
                                          nch * group), :].astype(jnp.int32)
                                pairs = [
                                    make_masks(
                                        i0 + k, b,
                                        blk_w[k * group:(k + 1) * group],
                                        mode=mode)
                                    for k in range(nch)]
                            else:
                                pairs = [make_masks(i0 + k, b, mode=mode)
                                         for k in range(nch)]
                            return tuple(acc + dot_(a2, a1)
                                         for acc, (a2, a1) in zip(accs,
                                                                  pairs))

                        return jax.lax.fori_loop(
                            lo, hi, bfun,
                            tuple(jnp.zeros((rows, _BLOCK), jnp.float32)
                                  for _ in range(nch)))

                    def run_groups(i0, nch):
                        parts = {mode: chain_accs(i0, nch, lo, hi, mode)
                                 for mode, lo, hi in ranges}
                        for k in range(nch):
                            if ei_split:
                                # E rows [0, r3p) + I rows [r3p, W2p) +
                                # the mixed block's full-height acc
                                acc = jnp.concatenate(
                                    [parts['E'][k], parts['I'][k]],
                                    axis=0) + parts['full'][k]
                            else:
                                acc = parts['full'][k]
                            flush(i0 + k, acc)

                    if plan is not None:
                        # tier plan: bodies are nch_t contiguous c-groups
                        # addressed through a VMEM indirection column, so
                        # one fori body instance serves an arbitrary
                        # (per-tier) subset of the factor sweep.
                        bod_ref, n_bod, sin_ref, n_sin, nch_t = plan

                        def fbody(i, _):
                            run_groups(bod_ref[i, 0], nch_t)
                            return 0

                        jax.lax.fori_loop(0, n_bod, fbody, 0)

                        def fsingle(i, _):
                            run_groups(sin_ref[i, 0], 1)
                            return 0

                        jax.lax.fori_loop(0, n_sin, fsingle, 0)
                    elif cg:
                        # dead-group elimination: flat columns at or past
                        # ceil(cols_raw/lr) are -1 for EVERY neuron (the
                        # lr*128 rounding pad of _partition_table_cg), so
                        # sweep only the live group prefix of each
                        # transposed chunk. NOTE: at 400k/rpb=384 the
                        # aligned per-partition maxima sum to exactly
                        # lane_rows (cols_raw=256), so nothing is skipped
                        # there (measured 156.1 vs 155.3 us/step); the
                        # win exists at sizes whose raw width rounds up.
                        cpg = _BLOCK // group
                        live_flat = -(-cols_raw // lr)
                        lgc = min(cpg, -(-live_flat // group))
                        # over-inclusive u-chunking needs headroom for the
                        # trailing body to run past lgc into the (all -1)
                        # rounding-pad c-groups — exact, they add zero
                        can_over = (-(-lgc // u)) * u <= cpg
                        for c in range(lr):
                            base_g = c * cpg

                            def gfun_c(i, _, base_g=base_g):
                                run_groups(base_g + i * u, u)
                                return 0

                            if dskip and can_over:
                                # live-prefix length for this chunk: the
                                # permuted c-group at depth unit t is
                                # dead iff t*glr + c >= maxd
                                tc = ((jnp.maximum(maxd - c, 0)
                                       + (_glr_d - 1)) // _glr_d)
                                n_live = jnp.int32(0)
                                for t, cnt in enumerate(_cnt_per_t):
                                    n_live = n_live + jnp.where(
                                        tc > t, jnp.int32(cnt),
                                        jnp.int32(0))
                                n_bodies = (jnp.minimum(n_live, lgc)
                                            + u - 1) // u
                                jax.lax.fori_loop(0, n_bodies, gfun_c, 0)
                                continue
                            jax.lax.fori_loop(0, lgc // u, gfun_c, 0)
                            for g in range(base_g + lgc - lgc % u,
                                           base_g + lgc):
                                run_groups(g, 1)
                    else:
                        def gfun_u(i, _):
                            run_groups(i * u, u)
                            return 0

                        jax.lax.fori_loop(0, n_groups // u, gfun_u, 0)
                        for g in range(n_groups - n_groups % u, n_groups):
                            run_groups(g, 1)

                if not pf:
                    if 'factor' not in _ablate:
                        run_factor(0, eb_r)
                    return 0

                # ---- prefetch=True: banked DMA/compute overlap -----------
                # Split the round's event blocks into two banks, issue BOTH
                # banks' HBM row fetches up front (each bank signals its own
                # DMA semaphore), then per bank: wait -> transpose -> factor.
                # Bank 1's flight hides behind bank 0's contraction, so the
                # gather phase costs ~issue only (it is DMA-COUNT-bound:
                # 209 us/step of the 708 at the 400k diag rate). The packed
                # increments are integer-valued in f32, so the two flushes
                # per group accumulate exactly the same values as one.
                nbh0 = (nblocks + 1) // 2
                banks = ((0, nbh0), (nbh0, nblocks))

                def bank_ops(h, b0, nb, wait):
                    base = b0 * _BLOCK
                    cnt_h = jnp.clip(cnt_r - base, 0, nb * _BLOCK)

                    def batch(q, _):
                        for j in range(8):
                            e = base + q * 8 + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            if cg:
                                cp = pltpu.make_async_copy(
                                    connr_ref.at[pl.ds(nid * lr, lr), :],
                                    rowbuf_ref.at[pl.ds(e * lr, lr), :],
                                    dmasem_ref.at[h])
                                cp.wait() if wait else cp.start()
                            else:
                                for t in range(lr):
                                    cp = pltpu.make_async_copy(
                                        connr_ref.at[
                                            pl.ds(nid * lr + t, 1), :],
                                        rowbuf_ref.at[
                                            pl.ds(t * cap + e, 1), :],
                                        dmasem_ref.at[h])
                                    cp.wait() if wait else cp.start()
                        return 0

                    jax.lax.fori_loop(0, (cnt_h + 7) // 8, batch, 0)

                if 'gather' not in _ablate:
                    for h, (b0, b1) in enumerate(banks):
                        bank_ops(h, b0, b1 - b0, wait=False)
                for h, (b0, b1) in enumerate(banks):
                    if 'gather' not in _ablate:
                        bank_ops(h, b0, b1 - b0, wait=True)
                    if 'transpose' not in _ablate:
                        for b in range(b0, b1):
                            transpose_block(b)
                    if 'factor' not in _ablate:
                        ebh = jnp.clip(eb_r - b0, 0, b1 - b0)
                        run_factor(b0, b0 + ebh)
                return 0

              jax.lax.fori_loop(0, rounds, one_round, 0)

            if tier:
                clean_f = cleanf_ref[:]
                scatter_pass(clean_f,
                             (abod_ref, tier_lens[0], asin_ref,
                              tier_lens[1], u_a))
                scatter_pass(1.0 - clean_f,
                             (bbod_ref, tier_lens[2], bsin_ref,
                              tier_lens[3], u_glob))
            else:
                scatter_pass(None, None)

            # ---- per-partition field unpack + conductance update ---------
            def unpack(x, rows):                                  # (r3p, 128)
                f2 = jnp.floor(x * (1.0 / 65536.0))
                rem = x - f2 * 65536.0
                f1 = jnp.floor(rem * (1.0 / 256.0))
                f0 = rem - f1 * 256.0
                return jnp.concatenate([f0, f1, f2], axis=0)[0:rows]

            ue, ui = [], []
            for pi in range(P):
                rp_act = min(R - pi * rpb, rpb)
                ue.append(unpack(
                    inc2p_ref[pi * W2p:pi * W2p + r3p, :], rp_act))
                ui.append(unpack(
                    inc2p_ref[pi * W2p + r3p:(pi + 1) * W2p, :], rp_act))
            ue = ue[0] if P == 1 else jnp.concatenate(ue, axis=0)
            ui = ui[0] if P == 1 else jnp.concatenate(ui, axis=0)
            ge_ref[:] = ge + w_e * ue
            gi_ref[:] = gi + w_i * ui
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    table_spec = (vmem() if table_space == 'vmem'
                  else pl.BlockSpec(memory_space=pltpu.ANY))
    scratch = [
        pltpu.VMEM((cap, 1), jnp.float32),        # compacted ids column
        pltpu.VMEM((lr * cap, _BLOCK), jnp.int32),  # gathered rows, tile-major
        # transposed rows, event-block-major (see the contraction comment)
        pltpu.VMEM(((cap // _BLOCK) * lane_rows, _BLOCK), jnp.float32),
        pltpu.VMEM((P * W2p, _BLOCK), jnp.float32),  # packed increments
    ]
    if table_space == 'hbm':
        # prefetch: one counting semaphore per bank (all of a bank's copies
        # signal it; each wait consumes its own copy's byte count)
        scratch.append(pltpu.SemaphoreType.DMA(
            (2,) if pf else ((8,) if cg else (8 * lr,))))
    # tier plans are scalar index columns consumed by dynamic `ref[i, 0]`
    # reads driving loop trip counts / slice offsets — SMEM is the only
    # Mosaic-legal home for that access pattern (a dynamic scalar read
    # from a VMEM vector needs a relayout Mosaic cannot always build).
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tier_specs = [vmem()] + [smem()] * 4 if tier else []
    sim = pl.pallas_call(
        kernel,
        in_specs=[table_spec, vmem()] + tier_specs + [vmem()] * 4,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=scratch,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    if conn_table is None:
        full = jnp.pad(jnp.asarray(table_np),
                       ((0, pad), (0, lane_rows - cols)),
                       constant_values=-1)
        if cg:
            conn = (full.reshape(num, _BLOCK, lr).transpose(0, 2, 1)
                    .reshape(num * lr, _BLOCK).astype(jnp.int32))
        else:
            conn = full.reshape(num * lr, _BLOCK)
    else:
        if conn_table.shape != (num * lr, _BLOCK):
            raise ValueError(
                f'conn_table shape {conn_table.shape} does not match the '
                f'mxu6 layout {(num * lr, _BLOCK)} for rpb={rpb}, '
                f'group={group}, gather={gather!r} (build it with '
                f'mxu6_conn_table and the SAME gather mode AND radix — '
                f'the flat layouts are not interchangeable, and a radix '
                f'mismatch is shape-compatible but decodes wrong).')
        conn = conn_table.astype(jnp.int32)
    pmap = jnp.asarray(pmap_np.reshape(n_groups, 1))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    tier_args = ()
    if tier:
        tier_args = (jnp.asarray(clean_np.reshape(R, _BLOCK)),
                     *(jnp.asarray(a) for a in tier_plan_np))
    out = sim(
        conn,                          # tile-flattened (num * lr, 128)
        pmap,
        *tier_args,
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_mxu5(net, state, n_steps: int, inp: float = 20.0,
                          platform=None, *, mask_dtype=None,
                          table_space: str = 'auto', cap_divisor: int = 448,
                          factors: str = 'unrolled'):
    """mxu3 with CHANNEL-SPLIT scatter: separate E and I compactions.

    mxu3 stacks both channels into one ``(slots, 2*R3)`` packed one-hot
    factor, so every synapse pays a ``2*R3``-wide factor build (VPU) and a
    ``2*R3 x 128`` MXU column — but each synapse only ever writes ONE
    channel. Splitting the step into two per-channel passes (excitatory
    spikes then inhibitory spikes, each with its own position map,
    compaction, gather, and an ``R3``-wide contraction sized to its own
    population) halves both dominant terms of the 400k cost model
    (BENCH_NOTES.md roofline: E*W2*128 MXU MACs + E*W2 factor-build VPU
    element-ops):

    - MXU:   ``E * (2*R3) * 128`` -> ``(E_e + E_i) * R3 * 128``
    - VPU:   ``E * 2*R3`` m2 builds -> ``E * R3``
    - VMEM:  the event row buffer shrinks to ``max(cap_e, cap_i)`` rows.

    Per-channel capacities follow each population's expected active count
    (``n_exc/cap_divisor`` and ``n_inh/cap_divisor``), so the inhibitory
    pass's fixed MXU cost is ~4x smaller than the excitatory one's instead
    of equal.  Exactness is unchanged: per-channel overflow rounds, the
    same count-then-scale contract, and the same 8-bit-field packing bound
    (checked per channel against the table's max in-degree; falls back to
    mxu2 when violated).  Replaces the reference's hybrid scatter kernels
    (``/root/reference/brainevent/_csr/binary_csrmv_hybrid.cu``) with an
    all-vectorized two-channel formulation.

    ``factors='fori'`` replaces the ~``2 * n_conn`` statically-unrolled
    per-synapse-column factor builds (the step body's program-size driver
    — Mosaic compile minutes at 400k) with ONE in-kernel transpose of the
    gathered target rows per round plus a dynamic ``fori_loop`` over
    columns: each iteration reads a ``(1, cap)`` dynamic-sublane row of
    the transposed buffer and contracts row-oriented ``(R3, cap)`` /
    ``(128, cap)`` one-hot factors.  Same math, ~``n_conn``-fold smaller
    program.
    """
    true_num = net.num
    factors_mode = factors
    n_conn = net.conn_all.shape[1]
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    if mask_dtype is None:
        mask_dtype = jnp.float32 if num <= 20480 else jnp.bfloat16
    R = num // _BLOCK
    R3 = -(-R // 3)
    # each channel's half of the packed-increment buffer starts 8-aligned:
    # a misaligned sublane slice start forces Mosaic into per-sublane
    # copy lowering on every read-modify-write of the inhibitory half
    R3p = -(-R3 // 8) * 8
    W2 = 2 * R3p
    J = 4
    n_exc, n_inh = net.n_exc, true_num - net.n_exc
    r32 = lambda x: max(64, (x + 31) // 32 * 32)
    cap_e = r32(-(-n_exc // cap_divisor))
    cap_i = r32(-(-max(n_inh, 1) // cap_divisor))
    cap_m = max(cap_e, cap_i)
    kg_of = lambda c: max(d for d in range(1, n_conn + 1)
                          if n_conn % d == 0 and d * c <= _MXU_CHUNK)
    kg_e, kg_i = kg_of(cap_e), kg_of(cap_i)

    conn_np = np.asarray(net.conn_all)
    deg_e = np.bincount(conn_np[:n_exc].reshape(-1), minlength=num).max()
    deg_i = np.bincount(conn_np[n_exc:].reshape(-1), minlength=num).max() \
        if conn_np.shape[0] > n_exc else 0
    if max(int(deg_e), int(deg_i)) > 255:
        return einet_pallas_sim_mxu2(net, state, n_steps, inp, platform)

    lane_rows = -(-n_conn // _BLOCK) * _BLOCK
    table_bytes = num * lane_rows * 4
    scratch_bytes = (max(kg_e * cap_e, kg_i * cap_i) * (R3 + _BLOCK) * 2
                     + cap_m * lane_rows * 4 + W2 * _BLOCK * 4)
    state_bytes = 16 * num * 4
    spill_bytes = 32 * num * 4
    if table_space == 'auto':
        table_space = ('vmem' if (table_bytes + scratch_bytes + state_bytes
                                  + spill_bytes) <= _VMEM_LIMIT_BYTES
                       else 'hbm')
    vmem_table = table_bytes if table_space == 'vmem' else 0
    footprint = vmem_table + scratch_bytes + state_bytes + spill_bytes
    if footprint > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({footprint/1e6:.1f} '
            f'MB) exceeds the budget; use the sharded model for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba

    def kernel(connr_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               idscol_ref, rowbuf_ref, m2buf_ref, m1buf_ref, inc2p_ref,
               rowbufT_ref, *maybe_dmasem):
        dmasem_ref = maybe_dmasem[0] if maybe_dmasem else None
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        from ..fcn.pallas_kernels import _exclusive_block_offsets
        exc_mask = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                    * _BLOCK
                    + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                    ) < n_exc
        uppr = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
                ).astype(jnp.float32)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        idmat = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                 * _BLOCK
                 + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                 + 1).astype(jnp.float32)       # +1: 0 marks empty slots

        def channel_pass(spike_ch, cap, kg, inc_lo):
            """Compact + gather + R3-wide packed contraction, one channel.

            ``inc_lo`` selects the channel's static half of ``inc2p``.
            """
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, cap), 1).astype(jnp.float32)
            ecol = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
            r3iota = jax.lax.broadcasted_iota(jnp.int32, (1, R3), 1)
            # row-oriented iotas of the 'fori' factor mode
            ecolr = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
            r3col = jax.lax.broadcasted_iota(jnp.int32, (R3, 1), 0)
            lanecol = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 1), 0)

            spk_f = spike_ch.astype(jnp.float32)              # (R, 128)
            rowsum = jnp.sum(spk_f, axis=1, keepdims=True)    # (R, 1)
            offs = _exclusive_block_offsets(rowsum, R)        # (R, 1)
            prefix = jax.lax.dot_general(
                spk_f, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (R, 128)
            n_act = jnp.sum(spk_f).astype(jnp.int32)
            maxrow = jnp.max(rowsum).astype(jnp.int32)
            lrounds = (maxrow + J - 1) // J
            rounds = (n_act + cap - 1) // cap

            def one_round(r, _):
                shift = (r * cap).astype(jnp.float32)

                def lpass(lr, ids_row):
                    for j in range(J):
                        rank = (lr * J + j).astype(jnp.float32)
                        hit = (prefix == rank) & spike_ch     # (R, 128)
                        blkid = jnp.sum(jnp.where(hit, idmat, 0.0),
                                        axis=1, keepdims=True)  # (R, 1)
                        take = (offs + rank - shift) == cap_iota
                        ids_row = ids_row + jnp.sum(
                            jnp.where(take, blkid, 0.0),
                            axis=0, keepdims=True)
                    return ids_row

                ids_row = jax.lax.fori_loop(
                    0, lrounds, lpass, jnp.zeros((1, cap), jnp.float32))
                idscol_ref[0:cap, :] = ids_row.T              # (cap, 1)

                cnt_r = jnp.minimum(n_act - r * cap, cap)

                if table_space == 'vmem':
                    def gather(g, _):
                        for j in range(8):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            rowbuf_ref[pl.ds(e, 1), :] = \
                                connr_ref[pl.ds(nid, 1), :]
                        return 0
                else:
                    def gather(g, _):
                        def copy(j):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            return pltpu.make_async_copy(
                                connr_ref.at[pl.ds(nid, 1), :],
                                rowbuf_ref.at[pl.ds(e, 1), :],
                                dmasem_ref.at[j])
                        cps = [copy(j) for j in range(8)]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return 0

                jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                valid = ecol < cnt_r                          # (cap, 1)

                if factors_mode == 'fori':
                    # one transpose per round, then a DYNAMIC column loop:
                    # ~n_conn-fold smaller program than the unrolled
                    # builds. The buffer holds f32 VALUES (ids < 2^24,
                    # exact): Mosaic's dynamic-sublane load of an int32
                    # transpose output hits an internal lowering error.
                    rowbufT_ref[:, 0:cap] = jnp.swapaxes(
                        rowbuf_ref[0:cap, :], 0, 1).astype(jnp.float32)
                    validr = ecolr < cnt_r                    # (1, cap)

                    def kfun(k, _):
                        tgt = rowbufT_ref[pl.ds(k, 1),
                                          0:cap].astype(jnp.int32)
                        hi = tgt // _BLOCK
                        col = hi % R3
                        f = hi // R3
                        val = jnp.where(
                            validr,
                            jnp.where(f == 0, 1.0,
                                      jnp.where(f == 1, 256.0, 65536.0)),
                            0.0).astype(mask_dtype)           # (1, cap)
                        m2 = (col == r3col).astype(mask_dtype) * val
                        m1 = (tgt % _BLOCK == lanecol).astype(mask_dtype)
                        inc2p_ref[inc_lo:inc_lo + R3, :] = \
                            inc2p_ref[inc_lo:inc_lo + R3, :] + \
                            jax.lax.dot_general(
                                m2, m1,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        return 0

                    jax.lax.fori_loop(0, n_conn, kfun, 0)
                    return 0

                def factors(k):
                    tgt = rowbuf_ref[0:cap, k:k + 1]          # (cap, 1)
                    hi = tgt // _BLOCK
                    col = hi % R3
                    f = hi // R3
                    val = jnp.where(
                        valid,
                        jnp.where(f == 0, 1.0,
                                  jnp.where(f == 1, 256.0, 65536.0)),
                        0.0).astype(mask_dtype)               # (cap, 1)
                    m2 = (col == r3iota).astype(mask_dtype) * val
                    m1 = (tgt % _BLOCK == lane128).astype(mask_dtype)
                    return m2, m1

                for k0 in range(0, n_conn, kg):
                    for kk in range(kg):
                        m2, m1 = factors(k0 + kk)
                        m2buf_ref[kk * cap:(kk + 1) * cap, 0:R3] = m2
                        m1buf_ref[kk * cap:(kk + 1) * cap, :] = m1
                    inc2p_ref[inc_lo:inc_lo + R3, :] = \
                        inc2p_ref[inc_lo:inc_lo + R3, :] + jax.lax.dot_general(
                            m2buf_ref[0:kg * cap, 0:R3],
                            m1buf_ref[0:kg * cap, :],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            inc2p_ref[:] = jnp.zeros_like(inc2p_ref)
            channel_pass(spike & exc_mask, cap_e, kg_e, 0)
            channel_pass(spike & ~exc_mask, cap_i, kg_i, R3p)

            def unpack(x):                                    # (R3, 128)
                f2 = jnp.floor(x * (1.0 / 65536.0))
                rem = x - f2 * 65536.0
                f1 = jnp.floor(rem * (1.0 / 256.0))
                f0 = rem - f1 * 256.0
                return jnp.concatenate([f0, f1, f2], axis=0)[0:R]

            ge_ref[:] = ge + w_e * unpack(inc2p_ref[0:R3, :])
            gi_ref[:] = gi + w_i * unpack(inc2p_ref[R3p:R3p + R3, :])
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    table_spec = (vmem() if table_space == 'vmem'
                  else pl.BlockSpec(memory_space=pltpu.ANY))
    scratch = [
        pltpu.VMEM((cap_m, 1), jnp.float32),        # compacted ids column
        pltpu.VMEM((cap_m, lane_rows), jnp.int32),  # gathered target rows
        pltpu.VMEM((max(kg_e * cap_e, kg_i * cap_i), R3), mask_dtype),
        pltpu.VMEM((max(kg_e * cap_e, kg_i * cap_i), _BLOCK), mask_dtype),
        pltpu.VMEM((W2, _BLOCK), jnp.float32),      # packed increments
        pltpu.VMEM((lane_rows, cap_m), jnp.float32),  # transposed rows (fori)
    ]
    if table_space == 'hbm':
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
    sim = pl.pallas_call(
        kernel,
        in_specs=[table_spec] + [vmem()] * 4,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=scratch,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    conn = jnp.pad(net.conn_all, ((0, pad), (0, lane_rows - n_conn)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        conn.astype(jnp.int32),
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_mxu2(net, state, n_steps: int, inp: float = 20.0,
                          platform=None):
    """Whole-simulation kernel with VECTORIZED event compaction.

    The event strategies above pay ~3-4 us of serialized scalar-unit
    latency per firing neuron (branchy ``pl.when`` scans + per-fire
    bookkeeping). This kernel removes the scan entirely:

    1. **Position map** (VPU + MXU): exclusive prefix sums — strict
       lower/upper-triangular matmuls, exact in f32 — assign every spiking
       neuron its compaction slot ``P[b, l]`` in id order (so excitatory
       events, occupying the low ids, come first — no channel flag needed).
    2. **Id compaction** (VPU): 128 static lane-compares accumulate the
       one-hot-gathered spiking-neuron ids into a ``(1, cap)`` row, which
       one small transpose turns into a scalar-readable column.
    3. **Target collection** (scalar, O(active)): one dynamic-sublane
       ``(1, n_conn)`` row copy per event from the row-major table —
       no branches, loop bounded by the live count.
    4. **Stacked one-hot contraction** (MXU): per static synapse-column k,
       ``m2[(k,e), r'] = [tgt//128 + R*[e >= n_e] == r']`` stacks both
       channels into one ``(*, 2R)`` factor; chunked dots against the lane
       one-hot yield both compact increments at once (binary factors,
       homogeneous weights applied after — exact).

    Bursts beyond ``cap`` are handled exactly by re-running compaction with
    a shifted slot window (``rounds = ceil(n_act / cap)``); at biological
    rates rounds == 1.
    """
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    # Compaction slots per round. Compare/build costs scale with cap, so it
    # sits ~1.4x the expected actives at ~23 Hz (num/435); bursts beyond it
    # just trigger extra (exact) rounds on their own step.
    cap = max(64, -(-num // 320) // 8 * 8)
    table_bytes = num * n_conn * 4
    state_bytes = 24 * num * 4
    if table_bytes + state_bytes > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({(table_bytes+state_bytes)/1e6:.1f} '
            f'MB) exceeds the budget; use the sharded model for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba
    n_exc = net.n_exc
    R = num // _BLOCK
    kgroup = max(1, _MXU_CHUNK // cap)          # synapse columns per dot

    def kernel(connr_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               idscol_ref, rowbuf_ref, inc2_ref):
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        exc_mask = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                    * _BLOCK
                    + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                    ) < n_exc
        # strict triangular prefix-sum factors (f32-exact integer sums)
        tril = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
                > jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
                ).astype(jnp.float32)
        uppr = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
                ).astype(jnp.float32)
        cap_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cap), 1).astype(jnp.float32)
        ecol = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        blk2r = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * R), 1)
        idmat = (jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 0)
                 * _BLOCK
                 + jax.lax.broadcasted_iota(jnp.int32, (R, _BLOCK), 1)
                 + 1).astype(jnp.float32)       # +1: 0 marks empty slots

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            ge = ge_ref[:] * decay_e
            gi = gi_ref[:] * decay_i
            v = v_ref[:]
            if coba:
                current = ge * (e_e - v) + gi * (e_i - v) + inp
            else:
                current = ge - gi + inp
            refractory = (t - tl_ref[:]) < p.tau_ref
            dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
            v = jnp.where(refractory, v, v + dv)
            spike = v >= p.v_th
            v_ref[:] = jnp.where(spike, p.v_reset, v)
            tl_ref[:] = jnp.where(spike, t, tl_ref[:])
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)

            # ---- vectorized position map ---------------------------------
            spk_f = spike.astype(jnp.float32)                     # (R, 128)
            rowsum = jnp.sum(spk_f, axis=1, keepdims=True)        # (R, 1)
            offs = jax.lax.dot_general(
                tril, rowsum, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (R, 1)
            prefix = jax.lax.dot_general(
                spk_f, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (R, 128)
            pos = jnp.where(spike, offs + prefix, -1.0)           # (R, 128)
            n_act = jnp.sum(spk_f).astype(jnp.int32)
            n_e = jnp.sum(jnp.where(spike & exc_mask, 1, 0)
                          ).astype(jnp.int32)

            inc2_ref[:] = jnp.zeros_like(inc2_ref)
            rounds = (n_act + cap - 1) // cap

            def one_round(r, _):
                shift = (r * cap).astype(jnp.float32)
                # ---- id compaction: one-hot gather into a (1, cap) row --
                ids_row = jnp.zeros((1, cap), jnp.float32)
                for lane in range(_BLOCK):
                    hit = pos[:, lane:lane + 1] == (cap_iota + shift)
                    ids_row = ids_row + jnp.sum(
                        jnp.where(hit, idmat[:, lane:lane + 1], 0.0),
                        axis=0, keepdims=True)
                idscol_ref[:] = ids_row.T                        # (cap, 1)

                cnt_r = jnp.minimum(n_act - r * cap, cap)

                # ---- target collection: one row copy per event, unrolled
                # 4x so the independent copies overlap. Slots past cnt_r
                # hold the 0 sentinel -> clamped to row 0, masked out of
                # the contraction by `valid` below.
                def gather(g, _):
                    for j in range(8):
                        e = 8 * g + j
                        nid = jnp.maximum(
                            idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                        rowbuf_ref[pl.ds(e, 1), :] = \
                            connr_ref[pl.ds(nid, 1), :]
                    return 0

                jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                # ---- stacked one-hot contraction -------------------------
                ne_r = jnp.clip(n_e - r * cap, 0, cnt_r)
                valid = ecol < cnt_r                             # (cap, 1)
                is_inh = (ecol >= ne_r).astype(jnp.int32)        # (cap, 1)
                acc = jnp.zeros((2 * R, _BLOCK), jnp.float32)
                for k0 in range(0, n_conn, kgroup):
                    kw = min(kgroup, n_conn - k0)
                    m2s, m1s = [], []
                    for k in range(k0, k0 + kw):
                        tgt = rowbuf_ref[:, k:k + 1]             # (cap, 1)
                        r2 = tgt // _BLOCK + R * is_inh
                        m2s.append(((r2 == blk2r) & valid
                                    ).astype(jnp.float32))       # (cap, 2R)
                        m1s.append((tgt % _BLOCK == lane128
                                    ).astype(jnp.float32))       # (cap, 128)
                    acc = acc + jax.lax.dot_general(
                        jnp.concatenate(m2s, axis=0),
                        jnp.concatenate(m1s, axis=0),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                inc2_ref[:] = inc2_ref[:] + acc
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

            ge_ref[:] = ge + w_e * inc2_ref[0:R, :]
            gi_ref[:] = gi + w_i * inc2_ref[R:2 * R, :]
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sim = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 5,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((cap, 1), jnp.float32),       # compacted ids column
            pltpu.VMEM((cap, n_conn), jnp.int32),    # gathered target rows
            pltpu.VMEM((2 * R, _BLOCK), jnp.float32),  # stacked increments
        ],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    conn = jnp.pad(net.conn_all, ((0, pad), (0, 0)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        conn.astype(jnp.int32),                      # row-major (num, n_conn)
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)


def einet_pallas_sim_mxu4(net, state, n_steps: int, inp: float = 20.0,
                          platform=None, *, row_chunk: int = 128,
                          table_space: str = 'auto'):
    """mxu3 with CHUNKED state phases: Mosaic instruction count is O(1) in
    the network size.

    mxu3's per-step vector phases materialize ``(R, 128)`` values (R =
    num/128 blocks), so at 200k+ neurons Mosaic emits tens of thousands of
    tiled ops and spills ~50 MB of live vectors — compile time grew from
    37 s (100k) to 26 MINUTES (400k). Here every O(R) phase — LIF update,
    position map, exclusive block offsets, two-stage id compaction, packed
    increment unpack — runs inside ``fori_loop``s over ``row_chunk``-block
    slices of VMEM-resident state, so the program size (and register
    pressure) is fixed by ``row_chunk``, not by ``num``. The event
    gather + packed one-hot MXU contraction (fixed shapes) are unchanged
    from mxu3, as are the count-then-scale exactness contract, burst
    overflow rounds, and the HBM-resident table option.

    Blocks are padded to ``3 * ceil(R / 3 / row_chunk) * row_chunk`` so the
    three mantissa-packed fields cover chunk-aligned row ranges (the
    per-field unpack then writes contiguous, aligned slices). Padded
    neurons start permanently refractory and never fire.

    Replaces the role of the reference's hybrid scatter kernels
    (``/root/reference/brainevent/_csr/binary_csrmv_hybrid.cu``) at the
    reference's flagship 400k-neuron scale.
    """
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    CH = row_chunk
    R_true = -(-true_num // _BLOCK)
    R3 = max(CH, -(-(-(-R_true // 3)) // CH) * CH)
    R = 3 * R3
    num = R * _BLOCK
    pad = num - true_num
    C = R // CH
    W2 = 2 * R3
    J = 4
    cap = max(64, (-(-num // 320) + 31) // 32 * 32)
    kg = max(d for d in range(1, n_conn + 1)
             if n_conn % d == 0 and d * cap <= _MXU_CHUNK)
    mask_dtype = jnp.bfloat16

    conn_np = np.asarray(net.conn_all)
    n_exc = net.n_exc
    deg_e = np.bincount(conn_np[:n_exc].reshape(-1), minlength=num).max()
    deg_i = np.bincount(conn_np[n_exc:].reshape(-1), minlength=num).max() \
        if conn_np.shape[0] > n_exc else 0
    if max(int(deg_e), int(deg_i)) > 255:
        raise ValueError(
            'mxu4 packs 3 block-rows per f32 mantissa; a per-channel table '
            f'in-degree of {max(int(deg_e), int(deg_i))} (> 255) would '
            'overflow the 8-bit fields. Use mxu2 or the sharded model.')

    lane_rows = -(-n_conn // _BLOCK) * _BLOCK
    table_bytes = num * lane_rows * 4
    # chunked phases bound live vectors by the chunk, not R; the O(R)
    # VMEM terms are the state/outputs and the spk/prefix/offs scratch
    state_bytes = (16 + 3) * num * 4 + R * _BLOCK * 4
    scratch_bytes = (kg * cap * (R3 + 2 * _BLOCK) * 2
                     + cap * lane_rows * 4 + 2 * R3 * _BLOCK * 4)
    spill_bytes = 24 * CH * _BLOCK * 4
    if table_space == 'auto':
        table_space = ('vmem' if (table_bytes + scratch_bytes + state_bytes
                                  + spill_bytes) <= _VMEM_LIMIT_BYTES
                       else 'hbm')
    vmem_table = table_bytes if table_space == 'vmem' else 0
    footprint = vmem_table + scratch_bytes + state_bytes + spill_bytes
    if footprint > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'VMEM-resident footprint ({footprint/1e6:.1f} MB) exceeds the '
            f'budget; use the sharded model for this size.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba

    def kernel(connr_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               spk_ref, pre_ref, offs_ref,
               idscol_ref, rowbuf_ref, ince_ref, inci_ref,
               *maybe_dmasem):
        dmasem_ref = maybe_dmasem[0] if maybe_dmasem else None
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

        uppr = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
                ).astype(jnp.float32)
        cap_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, cap), 1).astype(jnp.float32)
        ecol = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        r3iota = jax.lax.broadcasted_iota(jnp.int32, (1, R3), 1)
        tril = (jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
                > jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
                ).astype(jnp.float32)
        chunk_gid = (jax.lax.broadcasted_iota(jnp.int32, (CH, _BLOCK), 0)
                     * _BLOCK
                     + jax.lax.broadcasted_iota(jnp.int32, (CH, _BLOCK), 1))

        def step(it, _):
            t = it.astype(jnp.float32) * dt

            # ---- phase A: chunked LIF + spike/prefix/rowsum --------------
            def phaseA(c, carry):
                na, ne, mr = carry
                sl = pl.ds(c * CH, CH)
                ge = ge_ref[sl, :] * decay_e
                gi = gi_ref[sl, :] * decay_i
                ge_ref[sl, :] = ge
                gi_ref[sl, :] = gi
                v = v_ref[sl, :]
                if coba:
                    current = ge * (e_e - v) + gi * (e_i - v) + inp
                else:
                    current = ge - gi + inp
                refractory = (t - tl_ref[sl, :]) < p.tau_ref
                dv = (p.v_rest - v + p.r * current) * (dt / p.tau)
                v = jnp.where(refractory, v, v + dv)
                spike = v >= p.v_th
                v_ref[sl, :] = jnp.where(spike, p.v_reset, v)
                tl_ref[sl, :] = jnp.where(spike, t, tl_ref[sl, :])
                cnt_ref[sl, :] = cnt_ref[sl, :] + spike.astype(jnp.int32)
                spk_f = spike.astype(jnp.float32)
                spk_ref[sl, :] = spk_f
                pre_ref[sl, :] = jax.lax.dot_general(
                    spk_f, uppr, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                rowsum = jnp.sum(spk_f, axis=1, keepdims=True)
                offs_ref[sl, :] = rowsum          # overwritten in phase B
                exc = (chunk_gid + c * CH * _BLOCK) < n_exc
                na = na + jnp.sum(spk_f).astype(jnp.int32)
                ne = ne + jnp.sum(jnp.where(spike & exc, 1, 0)
                                  ).astype(jnp.int32)
                mr = jnp.maximum(mr, jnp.max(rowsum).astype(jnp.int32))
                return na, ne, mr

            n_act, n_e, maxrow = jax.lax.fori_loop(
                0, C, phaseA, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            lrounds = (maxrow + J - 1) // J

            # ---- phase B: chunked exclusive block offsets ----------------
            def phaseB(c, carry):
                sl = pl.ds(c * CH, CH)
                rs = offs_ref[sl, :]
                offs_ref[sl, :] = jax.lax.dot_general(
                    tril, rs, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + carry
                return carry + jnp.sum(rs)

            jax.lax.fori_loop(0, C, phaseB, jnp.float32(0))

            ince_ref[:] = jnp.zeros_like(ince_ref)
            inci_ref[:] = jnp.zeros_like(inci_ref)
            rounds = (n_act + cap - 1) // cap

            # ---- phase C: compaction rounds + gather + contraction -------
            def one_round(r, _):
                shift = (r * cap).astype(jnp.float32)

                def lpass(lr, ids_row):
                    def chunk_acc(c, ids_row):
                        sl = pl.ds(c * CH, CH)
                        spike = spk_ref[sl, :] > 0
                        prefix = pre_ref[sl, :]
                        offs = offs_ref[sl, :]
                        idmat_c = (chunk_gid + c * CH * _BLOCK + 1
                                   ).astype(jnp.float32)
                        for j in range(J):
                            rank = (lr * J + j).astype(jnp.float32)
                            hit = (prefix == rank) & spike
                            blkid = jnp.sum(jnp.where(hit, idmat_c, 0.0),
                                            axis=1, keepdims=True)
                            take = (offs + rank - shift) == cap_iota
                            ids_row = ids_row + jnp.sum(
                                jnp.where(take, blkid, 0.0),
                                axis=0, keepdims=True)
                        return ids_row

                    return jax.lax.fori_loop(0, C, chunk_acc, ids_row)

                ids_row = jax.lax.fori_loop(
                    0, lrounds, lpass, jnp.zeros((1, cap), jnp.float32))
                idscol_ref[:] = ids_row.T

                cnt_r = jnp.minimum(n_act - r * cap, cap)
                ne_r = jnp.clip(n_e - r * cap, 0, cnt_r)

                if table_space == 'vmem':
                    def gather(g, _):
                        for j in range(8):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            rowbuf_ref[pl.ds(e, 1), :] = \
                                connr_ref[pl.ds(nid, 1), :]
                        return 0
                else:
                    def gather(g, _):
                        def copy(j):
                            e = 8 * g + j
                            nid = jnp.maximum(
                                idscol_ref[e, 0].astype(jnp.int32) - 1, 0)
                            return pltpu.make_async_copy(
                                connr_ref.at[pl.ds(nid, 1), :],
                                rowbuf_ref.at[pl.ds(e, 1), :],
                                dmasem_ref.at[j])
                        cps = [copy(j) for j in range(8)]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return 0

                jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

                valid = ecol < cnt_r
                exc_e = valid & (ecol < ne_r)
                inh_e = valid & (ecol >= ne_r)

                def factors(k):
                    tgt = rowbuf_ref[:, k:k + 1]
                    hi = tgt // _BLOCK
                    col = hi % R3
                    f = hi // R3
                    val = jnp.where(f == 0, 1.0,
                                    jnp.where(f == 1, 256.0, 65536.0)
                                    ).astype(mask_dtype)
                    m2 = (col == r3iota).astype(mask_dtype) * val
                    lane_hot = tgt % _BLOCK == lane128
                    m1e = (lane_hot & exc_e).astype(mask_dtype)
                    m1i = (lane_hot & inh_e).astype(mask_dtype)
                    return m2, m1e, m1i

                dn = (((0,), (0,)), ((), ()))
                for k0 in range(0, n_conn, kg):
                    m2s, m1es, m1is = zip(*(factors(k0 + kk)
                                            for kk in range(kg)))
                    a2 = jnp.concatenate(m2s, axis=0)
                    ince_ref[:] = ince_ref[:] + jax.lax.dot_general(
                        a2, jnp.concatenate(m1es, axis=0),
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    inci_ref[:] = inci_ref[:] + jax.lax.dot_general(
                        a2, jnp.concatenate(m1is, axis=0),
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, rounds, one_round, 0)

            # ---- phase E: chunked per-field unpack + conductance update --
            # packed row p, field f -> output block f*R3 + p; each field's
            # output range is contiguous and chunk-aligned (R = 3*R3).
            def phaseE(c3, _):
                f = c3 // (R3 // CH)
                pc = c3 % (R3 // CH)
                psl = pl.ds(pc * CH, CH)
                osl = pl.ds(f * R3 + pc * CH, CH)

                def field(x):
                    f2 = jnp.floor(x * (1.0 / 65536.0))
                    rem = x - f2 * 65536.0
                    f1 = jnp.floor(rem * (1.0 / 256.0))
                    f0 = rem - f1 * 256.0
                    return jnp.where(f == 0, f0, jnp.where(f == 1, f1, f2))

                ge_ref[osl, :] = ge_ref[osl, :] + w_e * field(
                    ince_ref[psl, :])
                gi_ref[osl, :] = gi_ref[osl, :] + w_i * field(
                    inci_ref[psl, :])
                return 0

            jax.lax.fori_loop(0, 3 * (R3 // CH), phaseE, 0)
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)

    compact = lambda dtype: jax.ShapeDtypeStruct((R, _BLOCK), dtype)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    table_spec = (vmem() if table_space == 'vmem'
                  else pl.BlockSpec(memory_space=pltpu.ANY))
    scratch = [
        pltpu.VMEM((R, _BLOCK), jnp.float32),     # spike (0/1)
        pltpu.VMEM((R, _BLOCK), jnp.float32),     # in-block prefix
        pltpu.VMEM((R, 1), jnp.float32),          # exclusive block offsets
        pltpu.VMEM((cap, 1), jnp.float32),        # compacted ids column
        pltpu.VMEM((cap, lane_rows), jnp.int32),  # gathered target rows
        pltpu.VMEM((R3, _BLOCK), jnp.float32),    # packed exc increments
        pltpu.VMEM((R3, _BLOCK), jnp.float32),    # packed inh increments
    ]
    if table_space == 'hbm':
        scratch.append(pltpu.SemaphoreType.DMA((8,)))
    sim = pl.pallas_call(
        kernel,
        in_specs=[table_spec] + [vmem()] * 4,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=(compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.float32), compact(jnp.float32),
                   compact(jnp.int32)),
        scratch_shapes=scratch,
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 16 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )
    conn = jnp.pad(net.conn_all.astype(jnp.int32),
                   ((0, pad), (0, lane_rows - n_conn)))
    pad_c = lambda x, fill: jnp.pad(
        x, (0, pad), constant_values=fill).reshape(R, _BLOCK)
    out = sim(
        conn,
        pad_c(state.neurons.v, p.v_rest),
        pad_c(state.neurons.t_last, 1e30),
        pad_c(state.g_e, 0.0),
        pad_c(state.g_i, 0.0))
    v, tl, ge, gi, cnt = (x.reshape(num)[:true_num] for x in out)
    return (v, tl, ge, gi, cnt)
