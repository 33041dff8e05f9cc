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

"""Whole-simulation Pallas mega-kernel for EI networks.

The GPU reference pays per-step kernel-launch and HBM round-trip costs
(~26.6 us/step on an A6000 at 4k neurons). This kernel removes both: the
ENTIRE multi-step simulation runs inside one ``pallas_call``, with every
buffer resident in VMEM. The design is shaped by the Mosaic addressing
rules measured on hardware (dynamic *sublane* indexing is supported for
scalar reads and length-1 RMW slices; dynamic *lane* indexing is not; no
vector gathers/scatters; no in-kernel reshapes — but 2-D transposes and
static sub-slices are fine):

- **Neuron state is compact** ``(num/128, 128)`` so the LIF/decay vector
  math runs at full VPU width (the naive ``(num, 1)`` column layout wastes
  127/128 lanes and dominated earlier versions at ~42 us/step).
- **Connectivity** packs as ``(num/128 * n_conn, 128)``: the firing scan
  statically unrolls the 128 lanes of each block, so every table read is
  dynamic-sublane + static-lane.
- **Event propagation** is a true O(n_conn)-per-spike scatter into a
  ``(num, 8)`` column accumulator (``ref[pl.ds(tgt, 1), c:c+1] += w``, the
  TPU analogue of atomicAdd), with synapses interleaved over 8 independent
  read-modify-write chains. The accumulator returns to compact layout via
  one transpose + 128-wide static row copies.
- Firing neurons are located hierarchically (128-block vector max ->
  8-neuron sub-gates -> per-lane scalar checks), so quiet regions cost a
  few vector ops.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode

__all__ = ['einet_pallas_sim']

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # v5e exposes 128 MB of VMEM here
_BLOCK = 128   # neurons per scan block == lanes, statically unrolled
_CHAINS = 16   # interleaved accumulator columns per channel (RMW chains)


def einet_pallas_sim(net, state, n_steps: int, inp: float = 20.0,
                     platform=None):
    """Run ``n_steps`` of an :class:`~brainevent_tpu.models.EINet` inside one
    Pallas kernel; returns ``(v, t_last, g_e, g_i, spike_count)``.

    Raises ValueError when the connectivity table exceeds the VMEM budget
    (fall back to ``net.run``).
    """
    true_num = net.num
    n_conn = net.conn_all.shape[1]
    if n_conn % _CHAINS != 0:
        raise ValueError(f'n_conn ({n_conn}) must be a multiple of {_CHAINS}.')
    # pad to a 128 multiple with permanently-refractory dummy neurons
    num = ((true_num + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = num - true_num
    table_bytes = num * n_conn * 4
    # chain accumulators are (num, 8) logical but lane-padded to 128
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
    n_blocks = num // _BLOCK
    R = n_blocks

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
            spk = (v_ref[:] >= p.v_th).astype(jnp.int32)
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

                def mk_group(off, w):
                    def group(g, _):
                        row = base + g * _CHAINS
                        for c in range(_CHAINS):
                            tgt = conn_ref[row + c, lane]
                            inc_ref[pl.ds(tgt, 1), off + c:off + c + 1] = \
                                inc_ref[pl.ds(tgt, 1), off + c:off + c + 1] + w
                        return 0
                    return group

                @pl.when(i < n_exc)
                def _e():
                    jax.lax.fori_loop(0, n_conn // _CHAINS,
                                      mk_group(0, w_e), 0)

                @pl.when(i >= n_exc)
                def _i():
                    jax.lax.fori_loop(0, n_conn // _CHAINS,
                                      mk_group(_CHAINS, w_i), 0)

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

            jax.lax.fori_loop(0, n_blocks, block, 0)

            # chain-sum -> ONE transpose -> static row copies: back to compact
            inc = inc_ref[:]
            pair_ref[:, 0:1] = jnp.sum(inc[:, :_CHAINS], axis=1, keepdims=True)
            pair_ref[:, 1:2] = jnp.sum(inc[:, _CHAINS:], axis=1, keepdims=True)
            rows2 = pair_ref[:].T                            # (2, num)
            for r in range(R):
                ince_c_ref[r:r + 1, :] = rows2[0:1, r * 128:(r + 1) * 128]
                inci_c_ref[r:r + 1, :] = rows2[1:2, r * 128:(r + 1) * 128]

            ge = ge_ref[:] * decay_e + ince_c_ref[:]
            gi = gi_ref[:] * decay_i + inci_c_ref[:]
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
            ge_ref[:] = ge
            gi_ref[:] = gi
            cnt_ref[:] = cnt_ref[:] + spike.astype(jnp.int32)
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
