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

"""Sharded mega-kernel propagation: the mxu6 partitioned-table scatter as a
per-device, single-step Pallas kernel.

The single-chip mega-kernel (``models/pallas_sim.einet_pallas_sim_mxu6``)
keeps neuron state in VMEM across ALL simulation steps — that design cannot
cross chips, because each step's increments couple every shard. The
multi-chip factorization keeps the mxu6 SCATTER design (build-time
target-partitioned table, pre-decoded slots, two-level one-hot MXU
contraction, count-then-scale exactness) but runs it one step at a time per
device:

1. the table is partitioned/encoded ONCE globally (same layout math as
   mxu6, so segment widths are identical on every device) and row-sharded
   over the neuron mesh axis — each device holds its own sources' rows;
2. per step, each device compacts its LOCAL spikes and contracts its table
   shard into full-length per-class count partials (this kernel);
3. one ``psum_scatter`` per class rides ICI to both sum and re-shard the
   counts; scaling by the homogeneous weight happens after the reduction,
   so every partial is an exact small integer in f32 and the cross-device
   sum is bit-exact (the ``ShardedEINet._local_step`` contract).

Comm volume per step per class: ``num * 4`` bytes with ``psum_scatter``
(vs ``2 * num * 4`` for ``psum`` + local slice) — see
``docs/tutorials/sharding.md`` for the 2-8 chip projection at 400k.

Simplifications vs the tuned mxu6 factor phase (ei_split, wide fused
loads, block packing, prefetch): omitted — they are throughput knobs with
no effect on values; the sharded path shares the exactness contract and
the layout, and hardware tuning starts from the mxu6 winners.
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode

__all__ = ['MegaScatterLayout', 'build_mega_layout', 'mega_local_counts']

_BLOCK = 128


class MegaScatterLayout:
    """Global mxu6 table layout, sliceable by neuron shard.

    Built once on the host from the full ``(num, n_conn)`` target table;
    ``conn_flat`` is the c-group flat encoding ``(num * lr, 128)`` whose
    row blocks align with neuron shards (rows ``nid*lr .. nid*lr+lr``
    belong to neuron ``nid``), so sharding it with ``P(axis)`` hands every
    device exactly its sources' rows.
    """

    def __init__(self, conn_all: np.ndarray, n_exc: int, num: int, *,
                 rpb: int = 384, group: int = 4):
        from ..models.pallas_sim import (_partition_table_cg, _encode_slots)
        if num % _BLOCK:
            raise ValueError(
                f'sharded mega scatter needs num ({num}) divisible by 128')
        R = num // _BLOCK
        rpb = min(rpb, -(-R // 3) * 3)
        if rpb % 3:
            raise ValueError('rpb must be a multiple of 3')
        P_ = -(-R // rpb)
        span = rpb * _BLOCK
        table_np, pmap_np, lr, cols_raw, _depth_meta = _partition_table_cg(
            np.asarray(conn_all), span, P_, group)
        enc = _encode_slots(table_np, rpb // 3, n_exc)
        cols = lr * _BLOCK
        # per-target per-class in-degree must fit the 8-bit packed fields
        deg_e = np.bincount(conn_all[:n_exc].reshape(-1),
                            minlength=num).max() if n_exc else 0
        deg_i = np.bincount(conn_all[n_exc:].reshape(-1),
                            minlength=num).max() \
            if conn_all.shape[0] > n_exc else 0
        if max(int(deg_e), int(deg_i)) > 255:
            raise ValueError(
                'per-target per-class in-degree > 255: the packed-field '
                'mega scatter is not exact at this connectivity; use the '
                "ShardedEINet propagate='scatter' route.")
        full = np.full((num, cols), -1, np.int32)
        full[:enc.shape[0], :enc.shape[1]] = enc
        # c-group flat layout (mxu6_conn_table 'block' mode)
        self.conn_flat = jnp.asarray(
            full.reshape(num, _BLOCK, lr).transpose(0, 2, 1)
            .reshape(num * lr, _BLOCK))
        self.pmap = jnp.asarray(pmap_np.reshape(-1, 1).astype(jnp.int32))
        self.num = num
        self.R = R
        self.rpb = rpb
        self.P = P_
        self.lr = lr
        self.group = group
        self.cols = cols
        self.n_groups = cols // group
        self.r3p = rpb // 3
        self.W2p = 2 * self.r3p


def _make_counts_kernel(layout: MegaScatterLayout, cap: int, n_loc: int):
    lr, group = layout.lr, layout.group
    lane_rows = layout.cols
    P_, W2p, r3p = layout.P, layout.W2p, layout.r3p
    R, rpb = layout.R, layout.rpb
    n_groups = layout.n_groups

    def kernel(ids_ref, cnt_ref, conn_ref, pmap_ref,
               oute_ref, outi_ref, rowbuf_ref, rowbufT_ref, inc2p_ref):
        cnt_r = cnt_ref[0, 0]
        inc2p_ref[:] = jnp.zeros_like(inc2p_ref)

        # ---- gather: one (lr, 128) copy per event (VMEM table shard) ----
        def gather(g, _):
            for j in range(8):
                e = 8 * g + j
                nid = jnp.maximum(ids_ref[e, 0].astype(jnp.int32) - 1, 0)
                for t in range(lr):
                    rowbuf_ref[pl.ds(e * lr + t, 1), :] = \
                        conn_ref[pl.ds(nid * lr + t, 1), :]
            return 0

        jax.lax.fori_loop(0, (cnt_r + 7) // 8, gather, 0)

        # ---- per-event-block transposes (event-major chunks) ------------
        for b in range(cap // _BLOCK):
            @pl.when(b * _BLOCK < cnt_r)
            def _(b=b):
                for t in range(lr):
                    src = b * _BLOCK * lr + t * _BLOCK
                    rowbufT_ref[
                        b * lane_rows + t * _BLOCK:
                        b * lane_rows + (t + 1) * _BLOCK, :] = \
                        jnp.swapaxes(rowbuf_ref[src:src + _BLOCK, :],
                                     0, 1).astype(jnp.float32)

        # ---- factor: two-level one-hot contraction ----------------------
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
        w2col = jax.lax.broadcasted_iota(jnp.int32, (W2p, 1), 0)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 1), 0)
        eb_r = (cnt_r + _BLOCK - 1) // _BLOCK

        def run_group(g, _):
            def bfun(b, acc):
                tk = (g * group) // _BLOCK
                eloc = (tk * _BLOCK + lane_row) // lr
                valid_b = (b * _BLOCK + eloc) < cnt_r
                blk = rowbufT_ref[
                    pl.ds(b * lane_rows + g * group, group),
                    :].astype(jnp.int32)
                vslot_a = blk >= 0
                lane_a = blk & 127
                rest = blk >> 7
                fld_a = rest & 3
                col_a = rest >> 2
                m2s, m1s = [], []
                for j in range(group):
                    vslot = vslot_a[j:j + 1, :]
                    lane = lane_a[j:j + 1, :]
                    fld = fld_a[j:j + 1, :]
                    col = col_a[j:j + 1, :]
                    val = jnp.where(
                        valid_b & vslot,
                        jnp.where(fld == 0, 1.0,
                                  jnp.where(fld == 1, 256.0, 65536.0)),
                        0.0)
                    m2s.append((col == w2col).astype(jnp.float32))
                    m1s.append((lane == lanecol).astype(jnp.float32) * val)
                a2 = jnp.concatenate(m2s, axis=1)
                a1 = jnp.concatenate(m1s, axis=1)
                return acc + jax.lax.dot_general(
                    a2, a1, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, eb_r, bfun, jnp.zeros((W2p, _BLOCK), jnp.float32))
            base = pmap_ref[g, 0] * W2p
            inc2p_ref[pl.ds(base, W2p), :] = (
                inc2p_ref[pl.ds(base, W2p), :] + acc)
            return 0

        jax.lax.fori_loop(0, n_groups, run_group, 0)

        # ---- field unpack -> per-class global count maps ----------------
        def unpack(x, rows):
            f2 = jnp.floor(x * (1.0 / 65536.0))
            rem = x - f2 * 65536.0
            f1 = jnp.floor(rem * (1.0 / 256.0))
            f0 = rem - f1 * 256.0
            return jnp.concatenate([f0, f1, f2], axis=0)[0:rows]

        for pi in range(P_):
            rp_act = min(R - pi * rpb, rpb)
            oute_ref[pi * rpb:pi * rpb + rp_act, :] = unpack(
                inc2p_ref[pi * W2p:pi * W2p + r3p, :], rp_act)
            outi_ref[pi * rpb:pi * rpb + rp_act, :] = unpack(
                inc2p_ref[pi * W2p + r3p:(pi + 1) * W2p, :], rp_act)

    return kernel


@functools.partial(jax.jit, static_argnames=('layout', 'n_loc', 'cap',
                                             'interpret'))
def _counts_impl(spike_loc, conn_loc, pmap, *, layout: MegaScatterLayout,
                 n_loc: int, cap: int, interpret: bool):
    # LOCAL compaction in XLA: ranks by local id, ids stored +1 (0 = empty)
    spk_f = (spike_loc if spike_loc.dtype == jnp.bool_
             else spike_loc > 0).astype(jnp.float32)
    ranks = jnp.cumsum(spk_f) - 1.0
    total = jnp.sum(spk_f).astype(jnp.int32)
    n_rounds = max(1, -(-n_loc // cap))
    ids_full = jnp.zeros((n_rounds * cap,), jnp.float32)
    pos = jnp.where(spk_f > 0, ranks, 1e9).astype(jnp.int32)
    ids_full = ids_full.at[pos].set(
        jnp.arange(1, n_loc + 1, dtype=jnp.float32), mode='drop')

    run = pl.pallas_call(
        _make_counts_kernel(layout, cap, n_loc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((layout.R, _BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((layout.R, _BLOCK), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((layout.lr * cap, _BLOCK), jnp.int32),
            pltpu.VMEM((cap // _BLOCK * layout.cols, _BLOCK), jnp.float32),
            pltpu.VMEM((layout.P * layout.W2p, _BLOCK), jnp.float32),
        ],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )

    def one_round(r, accs):
        ids_r = jax.lax.dynamic_slice(ids_full, (r * cap,), (cap,))
        cnt_r = jnp.clip(total - r * cap, 0, cap).reshape(1, 1)
        oe, oi = run(ids_r.reshape(cap, 1), cnt_r, conn_loc, pmap)
        return (accs[0] + oe, accs[1] + oi)

    z = jnp.zeros((layout.R, _BLOCK), jnp.float32)
    oe, oi = jax.lax.fori_loop(0, n_rounds, one_round, (z, z))
    return oe.reshape(-1), oi.reshape(-1)


def mega_local_counts(spike_loc, conn_loc, pmap, *,
                      layout: MegaScatterLayout,
                      cap: int = 512, platform=None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Per-device mxu6-style scatter: LOCAL spikes x local table shard ->
    full-length ``(count_e, count_i)`` partials (exact small integers in
    f32; reduce with ``psum_scatter`` then scale).

    ``conn_loc``: this device's rows of ``layout.conn_flat``; ``pmap``:
    the (replicated) colgroup->partition map. ``cap``: per-round event
    capacity (rounded up to 128); overflow rounds are exact.
    """
    n_loc = conn_loc.shape[0] // layout.lr
    cap = min(-(-cap // _BLOCK) * _BLOCK,
              -(-n_loc // _BLOCK) * _BLOCK)
    return _counts_impl(spike_loc, conn_loc, pmap, layout=layout,
                        n_loc=n_loc, cap=cap,
                        interpret=interpret_mode(platform))
