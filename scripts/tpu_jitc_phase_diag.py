# Phase decomposition of the JITCNet step at scale (default 20 = 80k).
#
# Times, with the fused-loop K-vs-1 differencing protocol (relay-proof:
# rolled inputs, value-read forcing):
#   full      - the whole JITCNet.step
#   lif       - step minus propagation (LIF + decay + bookkeeping)
#   nonzero   - spike compaction for both projections
#   gather    - plan-stream row gathers (state2/q2 rows for the actives)
#   walk      - the scan_rounds fori_loop (RNG advance + weight eval +
#               candidate buffers)
#   sort      - the per-row candidate sort (row_cap compaction)
#   scatter   - event_scatter_add over the compacted candidates
#
# Usage: python scripts/tpu_jitc_phase_diag.py [scale] [iters]

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from brainevent_tpu.models.jitc_net import JITCNet  # noqa: E402
from brainevent_tpu._misc import _MV_STRIDE, _normalize_chunk_size  # noqa: E402
from brainevent_tpu.ops.scatter import event_scatter_add  # noqa: E402
from brainevent_tpu.rng.light import light_rng_bounded, light_rng_next  # noqa: E402

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300

net = JITCNet(scale=scale, weight_law='normal', coba=True)
n = net.num
print(f'n={n} exc={net.n_exc} inh={net.n_inh}', flush=True)

# representative spike pattern: ~22 Hz regime => rate*dt ~ 0.22% per step
rate = 0.0022
key = jax.random.PRNGKey(7)
spikes = (jax.random.uniform(key, (max(iters, 8), n)) < rate)

plan_e, plan_i = net.plan_e, net.plan_i
for nm, pl in (('E', plan_e), ('I', plan_i)):
    st = pl.setup[0]
    print(f'{nm}: streams={st.shape} scan_rounds={pl.scan_rounds} '
          f'row_cap={pl.row_cap} event_cap={pl.event_cap}', flush=True)


def timed(name, fn, a):
    """K-vs-1 fused-loop differencing; per-iteration varying inputs
    (dynamic row of *a*) defeat loop-invariant hoisting; value read
    forces completion through the relay."""
    def loop(k, a):
        def body(i, carry):
            r = fn(a[i % a.shape[0]])
            return carry + jnp.sum(jnp.abs(r))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.))

    jk = jax.jit(loop, static_argnums=0)
    float(jk(1, a))  # compile+warm 1
    float(jk(iters, a))  # compile+warm K
    t0 = time.perf_counter(); float(jk(1, a)); t1 = time.perf_counter()
    float(jk(iters, a)); t2 = time.perf_counter()
    us = ((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e6
    print(f'{name:28s} {us:10.1f} us', flush=True)
    return us


# ---- full step (real carried state) / propagation -------------------------
state0 = net.init_state()


def real_run(k, _a):
    def body(i, s):
        return net.step(s, i * net.dt)
    s = jax.lax.fori_loop(0, k, body, state0)
    return s


jk = jax.jit(real_run, static_argnums=0)
jax.block_until_ready(jk(1, 0))
jax.block_until_ready(jk(iters, 0))
t0 = time.perf_counter(); float(jk(1, 0).g_e.sum()); t1 = time.perf_counter()
float(jk(iters, 0).g_e.sum()); t2 = time.perf_counter()
print(f'{"step (real carried state)":28s} '
      f'{((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e6:10.1f} us', flush=True)


def full_prop(spk_row):
    inc_e, inc_i = net._propagate(spk_row)
    return inc_e + inc_i


timed('propagate (forced spikes)', full_prop, spikes)

# ---- propagation internals at the E projection ---------------------------
state2, q2, clarr = plan_e.setup
L = state2.shape[1]
n_chunks = L // _MV_STRIDE
cap = int(plan_e.event_cap)
rc = int(plan_e.row_cap)
rounds = int(plan_e.scan_rounds)
chunk = _normalize_chunk_size(n, None)
out_len = n
n_rows = net.n_exc
_U = jnp.uint32

spk_e = spikes[:, :net.n_exc]


def phase_nonzero(v):
    (ids,) = jnp.nonzero(v > 0, size=cap, fill_value=n_rows)
    return ids.astype(jnp.float32)


def phase_gather(v):
    (ids,) = jnp.nonzero(v > 0, size=cap, fill_value=n_rows)
    safe = jnp.where(ids < n_rows, ids, 0)
    st = state2[safe]
    q = q2[safe]
    return st.astype(jnp.float32).sum(1) + q.astype(jnp.float32).sum(1)


def _walk(v, with_weights=True):
    from brainevent_tpu.jitc.normal import _normal_weight as wfr
    params = (jnp.full((1,), net.w_e, jnp.float32),
              jnp.full((1,), 0.1 * net.w_e, jnp.float32))
    seed = jnp.uint32(net.seed)
    (ids,) = jnp.nonzero(v > 0, size=cap, fill_value=n_rows)
    valid = ids < n_rows
    safe = jnp.where(valid, ids, 0)
    st = state2[safe].reshape(cap, n_chunks, _MV_STRIDE)
    q = q2[safe].reshape(cap, n_chunks, _MV_STRIDE).astype(jnp.uint32)
    shape3 = (cap, n_chunks, _MV_STRIDE)
    rows3 = jnp.broadcast_to(safe.astype(jnp.uint32)[:, None, None], shape3)
    valid3 = jnp.broadcast_to(valid[:, None, None], shape3)
    chunks3 = jax.lax.broadcasted_iota(jnp.uint32, shape3, 1)
    lanes3 = jax.lax.broadcasted_iota(jnp.uint32, shape3, 2)
    chunk_start = chunks3 * _U(chunk)
    chunk_width = jnp.minimum(_U(chunk), _U(out_len) - chunk_start)
    cl = clarr[0]

    def round_body(r, carry):
        st, q, tgt_buf, val_buf = carry
        local_j = lanes3 + _U(_MV_STRIDE) * q
        active = jnp.logical_and(local_j < chunk_width, valid3)
        cols3 = chunk_start + local_j
        tgt_r = jnp.where(active, cols3.astype(jnp.int32), out_len)
        tgt_buf = jax.lax.dynamic_update_index_in_dim(
            tgt_buf, tgt_r.reshape(cap, L), r, 0)
        if with_weights:
            w = wfr(params, seed, rows3, cols3).astype(jnp.float32)
            val_r = jnp.where(active, w, 0.0)
            val_buf = jax.lax.dynamic_update_index_in_dim(
                val_buf, val_r.reshape(cap, L), r, 0)
        st = light_rng_next(st)
        q = q + _U(1) + light_rng_bounded(st, cl - _U(1))
        return st, q, tgt_buf, val_buf

    tgt0 = jnp.full((rounds, cap, L), out_len, jnp.int32)
    val0 = jnp.zeros((rounds, cap, L), jnp.float32)
    st, q, tgt_buf, val_buf = jax.lax.fori_loop(
        0, rounds, round_body, (st, q, tgt0, val0))
    return tgt_buf, val_buf, rows3, params, seed


def phase_walk(v):
    tgt_buf, val_buf, *_ = _walk(v, with_weights=True)
    return tgt_buf.astype(jnp.float32).sum((1, 2)) + val_buf.sum((1, 2))


def phase_walk_noweight(v):
    tgt_buf, _, *_ = _walk(v, with_weights=False)
    return tgt_buf.astype(jnp.float32).sum((1, 2))


def phase_sort2(v):
    tgt_buf, val_buf, *_ = _walk(v, with_weights=True)
    tgt2 = tgt_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    val2 = val_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    tgt2, val2 = jax.lax.sort((tgt2, val2), dimension=1, num_keys=1)
    return tgt2[:, :rc].astype(jnp.float32) + val2[:, :rc]


def phase_sort1(v):
    tgt_buf, _, *_ = _walk(v, with_weights=False)
    tgt2 = tgt_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    tgt2 = jax.lax.sort(tgt2, dimension=1)
    return tgt2[:, :rc].astype(jnp.float32)


def phase_all_now(v):
    """Current pipeline: walk(+weights) -> 2-op sort -> scatter."""
    tgt_buf, val_buf, *_ = _walk(v, with_weights=True)
    tgt2 = tgt_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    val2 = val_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    tgt2, val2 = jax.lax.sort((tgt2, val2), dimension=1, num_keys=1)
    out = event_scatter_add(tgt2[:, :rc].reshape(-1),
                            val2[:, :rc].reshape(-1), out_len,
                            dtype=jnp.float32)
    return out


def phase_all_deferred(v):
    """Candidate pipeline: walk(no weights) -> 1-op sort -> weight on the
    row_cap survivors -> scatter."""
    from brainevent_tpu.jitc.normal import _normal_weight as wfr
    params = (jnp.full((1,), net.w_e, jnp.float32),
              jnp.full((1,), 0.1 * net.w_e, jnp.float32))
    seed = jnp.uint32(net.seed)
    (ids,) = jnp.nonzero(v > 0, size=cap, fill_value=n_rows)
    safe = jnp.where(ids < n_rows, ids, 0)
    tgt_buf, _, *_ = _walk(v, with_weights=False)
    tgt2 = tgt_buf.transpose(1, 0, 2).reshape(cap, rounds * L)
    tgt2 = jax.lax.sort(tgt2, dimension=1)[:, :rc]
    rows2 = jnp.broadcast_to(safe.astype(jnp.uint32)[:, None], (cap, rc))
    live = tgt2 < out_len
    cols2 = jnp.where(live, tgt2, 0).astype(jnp.uint32)
    w2 = wfr(params, seed, rows2, cols2).astype(jnp.float32)
    val2 = jnp.where(live, w2, 0.0)
    out = event_scatter_add(tgt2.reshape(-1), val2.reshape(-1), out_len,
                            dtype=jnp.float32)
    return out


def phase_scatter(v):
    # scatter alone on a representative compacted candidate set
    (ids,) = jnp.nonzero(v > 0, size=cap, fill_value=n_rows)
    k0 = ids[0].astype(jnp.uint32)
    tgt = ((jax.lax.iota(jnp.int32, cap * rc) * 1103515245 + k0.astype(
        jnp.int32)) % (out_len + out_len // 7))
    tgt = jnp.where(tgt < out_len, tgt, out_len)
    val = jnp.ones((cap * rc,), jnp.float32)
    return event_scatter_add(tgt, val, out_len, dtype=jnp.float32)


timed('E nonzero (64k)', phase_nonzero, spk_e)
timed('E nonzero+gather', phase_gather, spk_e)
timed('E walk (with weights)', phase_walk, spk_e)
timed('E walk (no weights)', phase_walk_noweight, spk_e)
timed('E walk+sort 2-op', phase_sort2, spk_e)
timed('E walk+sort 1-op', phase_sort1, spk_e)
timed('E full pipe (current)', phase_all_now, spk_e)
timed('E full pipe (deferred w)', phase_all_deferred, spk_e)
timed('E scatter only', phase_scatter, spk_e)

# sanity: deferred == current on one batch
a = jax.jit(phase_all_now)(spk_e[0])
b = jax.jit(phase_all_deferred)(spk_e[0])
import numpy as np  # noqa: E402
print('deferred max|diff|:', float(jnp.max(jnp.abs(a - b))),
      ' nonzeros:', int(jnp.sum(a != 0)), flush=True)
print('DONE')
