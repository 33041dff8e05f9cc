# JITCNet step-anatomy diagnostic: per-phase knockouts of the
# event-compacted plan route (jitc/event_route.py) inside the full 80k
# EI step, mxu6-diag protocol: w_e = w_i = 1e-30 so ablated increments
# cannot feed back into the spike dynamics (the regime is input-driven
# and IDENTICAL across variants — knockout results are numerically
# WRONG by design; only the timing attribution is meaningful).
#
#   python scripts/tpu_jitc_net_diag.py [scale] [steps] [variant ...]
#
# Variants: full, noscatter, nosort, noweights, nowalk, nogather,
# nononzero, noprop (LIF-only floor). Default: all, one jit each,
# fresh states per timed run (relay caches byte-identical calls).
import sys
import time

import jax
import jax.numpy as jnp

from brainevent_tpu._misc import _MV_STRIDE, _normalize_chunk_size
from brainevent_tpu.models import JITCNet
from brainevent_tpu.models.neurons import lifref_step
from brainevent_tpu.rng.light import light_rng_bounded, light_rng_next

_U = jnp.uint32

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
only = set(sys.argv[3:])

net = JITCNet(scale=scale, weight_law='normal', w_e=1e-30, w_i=1e-30)
print('devices:', jax.devices(), flush=True)
print(f'n={net.num} cap_e={net.plan_e.event_cap} cap_i={net.plan_i.event_cap}'
      f' rounds={net.plan_e.scan_rounds} row_cap={net.plan_e.row_cap}',
      flush=True)


def route(plan, weight_fn, v, out_len, n_rows, ablate):
    """jitc_event_matvec_plan body (event_route.py) with knockouts.

    Returns (out, overflow_flag); the fallback is a zeros stub (counted,
    never trusted — w=1e-30 keeps dynamics independent of it).
    """
    state2, q2, cl = plan.setup
    cl = cl[0]
    params = tuple(jnp.atleast_1d(jnp.asarray(a, jnp.float32))
                   for a in plan.matrix.data[:2])
    seed = jnp.atleast_1d(jnp.asarray(plan.matrix.seed))[0]
    chunk_size = _normalize_chunk_size(plan._shape[1], None)
    scan_rounds = int(plan.scan_rounds)
    cap = int(plan.event_cap)
    row_cap = int(plan.row_cap) if plan.row_cap else None
    L = state2.shape[1]
    n_chunks = L // _MV_STRIDE

    active_rows = v > 0
    n_act = jnp.sum(active_rows, dtype=jnp.int32)
    if 'nononzero' in ablate:
        ids = jnp.arange(cap, dtype=jnp.int32) + n_act * 0
    else:
        (ids,) = jnp.nonzero(active_rows, size=cap, fill_value=n_rows)
    valid = ids < n_rows
    safe = jnp.where(valid, ids, 0)

    if 'nogather' in ablate:
        st = (state2[:cap] + safe[0].astype(jnp.uint32)
              ).reshape(cap, n_chunks, _MV_STRIDE)
        q = (q2[:cap].astype(jnp.uint32)
             ).reshape(cap, n_chunks, _MV_STRIDE)
    else:
        st = state2[safe].reshape(cap, n_chunks, _MV_STRIDE)
        q = q2[safe].reshape(cap, n_chunks, _MV_STRIDE).astype(jnp.uint32)

    shape3 = (cap, n_chunks, _MV_STRIDE)
    rows3 = jnp.broadcast_to(safe.astype(jnp.uint32)[:, None, None], shape3)
    valid3 = jnp.broadcast_to(valid[:, None, None], shape3)
    chunks3 = jax.lax.broadcasted_iota(jnp.uint32, shape3, 1)
    lanes3 = jax.lax.broadcasted_iota(jnp.uint32, shape3, 2)
    chunk_start = chunks3 * _U(chunk_size)
    chunk_width = jnp.minimum(_U(chunk_size), _U(out_len) - chunk_start)

    if 'nowalk' in ablate:
        # plausible target volume without the RNG walk: lane-striped
        # columns, dependent on st so the gather cannot be DCE'd
        fake = (chunk_start + lanes3 + (st[0, 0, 0] & _U(0))
                ).astype(jnp.int32)
        tgt_buf = jnp.broadcast_to(fake[None], (scan_rounds,) + shape3
                                   ).reshape(scan_rounds, cap, L)
        residual = jnp.bool_(False)
    else:
        def round_body(r, carry):
            st, q, tgt_buf = carry
            local_j = lanes3 + _U(_MV_STRIDE) * q
            active = jnp.logical_and(local_j < chunk_width, valid3)
            cols3 = chunk_start + local_j
            tgt_r = jnp.where(active, cols3.astype(jnp.int32), out_len)
            tgt_buf = jax.lax.dynamic_update_index_in_dim(
                tgt_buf, tgt_r.reshape(cap, L), r, 0)
            st = light_rng_next(st)
            q = q + _U(1) + light_rng_bounded(st, cl - _U(1))
            return st, q, tgt_buf

        tgt_buf0 = jnp.full((scan_rounds, cap, L), out_len, jnp.int32)
        st, q, tgt_buf = jax.lax.fori_loop(
            0, scan_rounds, round_body, (st, q, tgt_buf0))
        local_j = lanes3 + _U(_MV_STRIDE) * q
        residual = jnp.any(jnp.logical_and(local_j < chunk_width, valid3))

    slots = scan_rounds * L
    tgt2 = tgt_buf.transpose(1, 0, 2).reshape(cap, slots)

    if row_cap is not None and row_cap < slots:
        if 'nosort' in ablate:
            tgt2 = tgt2[:, :row_cap]
        else:
            tgt2 = jax.lax.sort(tgt2, dimension=1)
            over_row = jnp.any(tgt2[:, row_cap] < out_len)
            residual = jnp.logical_or(residual, over_row)
            tgt2 = tgt2[:, :row_cap]

    live2 = tgt2 < out_len
    rows2 = jnp.broadcast_to(safe.astype(jnp.uint32)[:, None], tgt2.shape)
    cols2 = jnp.where(live2, tgt2, 0).astype(jnp.uint32)
    if 'noweights' in ablate:
        w2 = (rows2 + cols2).astype(jnp.float32) * 1e-30
    else:
        w2 = weight_fn(params, seed, rows2, cols2).astype(jnp.float32)
    val2 = jnp.where(live2, w2, 0.0)

    tgt = tgt2.reshape(-1)
    val = val2.reshape(-1)

    if 'noscatter' in ablate:
        out = jnp.zeros(out_len, jnp.float32).at[0].add(jnp.sum(val))
    else:
        from brainevent_tpu.ops.scatter import event_scatter_add
        out = event_scatter_add(tgt, val, out_len, dtype=jnp.float32)
    overflow = jnp.logical_or(n_act > cap, residual)
    return jnp.where(overflow, 0.0, 1.0) * out, overflow


WFN = {}


def make_step(ablate):
    from brainevent_tpu.jitc.normal import _normal_weight
    import math

    def step(state, t, ncount):
        p = net.params
        g_e = state.g_e * jnp.float32(math.exp(-net.dt / net.tau_e))
        g_i = state.g_i * jnp.float32(math.exp(-net.dt / net.tau_i))
        current = (g_e * (net.e_e - state.neurons.v)
                   + g_i * (net.e_i - state.neurons.v) + 20.0)
        neurons, spike = lifref_step(state.neurons, current, t, net.dt, p)
        if 'noprop' in ablate:
            inc_e = jnp.zeros(net.num) + spike.sum() * 1e-30
            inc_i = inc_e
            ncount = ncount + 0
        else:
            inc_e, ov_e = route(net.plan_e, _normal_weight,
                                spike[:net.n_exc].astype(jnp.float32),
                                net.num, net.n_exc, ablate)
            inc_i, ov_i = route(net.plan_i, _normal_weight,
                                spike[net.n_exc:].astype(jnp.float32),
                                net.num, net.n_inh, ablate)
            ncount = ncount + ov_e.astype(jnp.int32) + ov_i.astype(jnp.int32)
        return type(state)(
            neurons=neurons, g_e=g_e + inc_e, g_i=g_i + inc_i,
            spike_count=state.spike_count + spike.astype(jnp.int32)), ncount

    def run(st):
        def body(i, carry):
            s, nc = carry
            return step(s, i * net.dt, nc)
        return jax.lax.fori_loop(0, steps, body, (st, jnp.int32(0)))

    return jax.jit(run)


VARIANTS = ['full', 'noscatter', 'nosort', 'noweights', 'nowalk',
            'nogather', 'nononzero', 'noprop']
for name in VARIANTS:
    if only and name not in only:
        continue
    ablate = () if name == 'full' else (name,)
    f = make_step(ablate)
    t0 = time.perf_counter()
    out, nover = f(net.init_state(jax.random.PRNGKey(0)))
    spk = float(jnp.sum(out.spike_count))
    tc = time.perf_counter() - t0
    times = []
    for k in (1, 2, 3):
        s = net.init_state(jax.random.PRNGKey(k))
        t0 = time.perf_counter()
        out, nover = f(s)
        spk = float(jnp.sum(out.spike_count))
        nov = int(nover)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f'{name:>10}: {best/steps*1e6:8.2f} us/step  '
          f'(runs {[round(t/steps*1e6, 1) for t in times]}, '
          f'{spk:.0f} spikes, overflow_steps={nov}, compile {tc:.0f}s)',
          flush=True)
