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
ENTIRE multi-step simulation runs inside one ``pallas_call``:

- connectivity table resident in VMEM (transposed ``(n_conn, num)`` layout
  so one dynamic minor-dim slice loads a neuron's full target list),
- all neuron/synapse state resident in VMEM between steps — zero HBM
  traffic inside the loop,
- event propagation re-formulated for the VPU: Mosaic has no scattered
  stores, so each firing neuron's target list becomes a broadcast-compare
  one-hot block ``(targets[:, None] == iota[None, :])`` summed on the vector
  unit — O(n_conn x num) lanes per *event*, executed only for firing
  neurons, found by a two-level (group -> neuron) predicated scan.

Per step at 4k neurons / ~0.5% activity this is ~10 us of VPU work vs the
reference GPU's 26.6 us wall.
"""

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._compat import pallas_tpu_params
from ..ops.pallas_utils import interpret_mode

__all__ = ['einet_pallas_sim']

_VMEM_LIMIT_BYTES = 12 * 1024 * 1024
_GROUP = 32  # neurons per scan group


def einet_pallas_sim(net, state, n_steps: int, inp: float = 20.0,
                     platform=None):
    """Run ``n_steps`` of an :class:`~brainevent_tpu.models.EINet` inside one
    Pallas kernel; returns ``(v, t_last, g_e, g_i, spike_count)``.

    Raises ValueError when the connectivity table exceeds the VMEM budget
    (fall back to ``net.run``).
    """
    num = net.num
    n_conn = net.conn_all.shape[1]
    table_bytes = num * n_conn * 4
    if table_bytes + 8 * num * 4 > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f'Connectivity table ({table_bytes/1e6:.1f} MB) exceeds the VMEM '
            f'budget; use EINet.run for this size.')
    if num % _GROUP != 0:
        raise ValueError(f'num ({num}) must be a multiple of {_GROUP}.')

    p = net.params
    dt = net.dt
    decay_e = float(np.float32(math.exp(-dt / net.tau_e)))
    decay_i = float(np.float32(math.exp(-dt / net.tau_i)))
    w_e, w_i = float(net.w_e), float(net.w_i)
    e_e, e_i = float(net.e_e), float(net.e_i)
    coba = net.coba
    n_exc = net.n_exc
    n_groups = num // _GROUP

    conn_t = net.conn_all.T  # (n_conn, num): column i = targets of neuron i

    def kernel(conn_ref, v0_ref, tl0_ref, ge0_ref, gi0_ref,
               v_ref, tl_ref, ge_ref, gi_ref, cnt_ref,
               spk_ref, grp_ref, ince_ref, inci_ref):
        v_ref[:] = v0_ref[:]
        tl_ref[:] = tl0_ref[:]
        ge_ref[:] = ge0_ref[:]
        gi_ref[:] = gi0_ref[:]
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, num), 1)

        def step(it, _):
            t = it.astype(jnp.float32) * dt
            spk = (v_ref[:] >= p.v_th).astype(jnp.int32)
            spk_ref[:] = spk
            # per-group activity flags for the hierarchical scan
            grp_ref[:] = jnp.max(spk.reshape(n_groups, _GROUP), axis=1)
            ince_ref[:] = jnp.zeros_like(ince_ref)
            inci_ref[:] = jnp.zeros_like(inci_ref)

            def fire(i):
                # one-hot block of this neuron's targets, summed on the VPU
                targets = conn_ref[:, pl.ds(i, 1)]           # (n_conn, 1)
                hits = (targets == iota).astype(jnp.float32)  # (n_conn, num)
                contrib = jnp.sum(hits, axis=0)

                @pl.when(i < n_exc)
                def _e():
                    ince_ref[:] = ince_ref[:] + contrib * w_e

                @pl.when(i >= n_exc)
                def _i():
                    inci_ref[:] = inci_ref[:] + contrib * w_i

            def neuron(j, g):
                i = g * _GROUP + j

                @pl.when(spk_ref[i] > 0)
                def _():
                    fire(i)
                return g

            def group(g, _):
                @pl.when(grp_ref[g] > 0)
                def _():
                    jax.lax.fori_loop(0, _GROUP, neuron, g)
                return 0

            jax.lax.fori_loop(0, n_groups, group, 0)

            ge = ge_ref[:] * decay_e + ince_ref[:]
            gi = gi_ref[:] * decay_i + inci_ref[:]
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

    out_shapes = (
        jax.ShapeDtypeStruct((num,), jnp.float32),  # v
        jax.ShapeDtypeStruct((num,), jnp.float32),  # t_last
        jax.ShapeDtypeStruct((num,), jnp.float32),  # g_e
        jax.ShapeDtypeStruct((num,), jnp.float32),  # g_i
        jax.ShapeDtypeStruct((num,), jnp.int32),    # spike_count
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 5,
        out_specs=tuple(vmem() for _ in range(5)),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((num,), jnp.int32),       # spike flags
            pltpu.VMEM((n_groups,), jnp.int32),  # group flags
            pltpu.VMEM((num,), jnp.float32),     # inc_e
            pltpu.VMEM((num,), jnp.float32),     # inc_i
        ],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES + 4 * 1024 * 1024),
        interpret=interpret_mode(platform),
    )(conn_t, state.neurons.v, state.neurons.t_last,
      state.g_e, state.g_i)
    return out
