# Prototype A/B: sorted windowed scatter-add vs the one-hot MXU route
# and raw XLA .at[].add, on the live chip.
#
# Idea: sort events by target block (3-operand variadic lax.sort), chunk
# the sorted stream (C events), express each chunk's scatter as a
# (W, C) @ (C, 128) dot against the chunk's base block (rel = blk -
# base < W for dense-enough streams), then row-scatter the (nch, W, 128)
# partials — nch*W row adds instead of E element adds, and no (B, E)
# one-hot materialization.
#
# Usage: python scripts/tpu_windowed_scatter_proto.py [iters]
import sys
import time
import json
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from brainevent_tpu.ops.scatter import event_scatter_add, bf16_split

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300


def windowed_scatter(tgt, val, n_out, *, C=512, W=16, passes=0):
    """passes=0: f32 HIGHEST dot; else bf16-split value factor."""
    E = tgt.shape[0]
    B = -(-n_out // 128)
    blk = tgt // 128
    lane = tgt % 128
    nch = -(-E // C)
    pad = nch * C - E
    if pad:
        blk = jnp.concatenate([blk, jnp.full(pad, B, jnp.int32)])
        lane = jnp.concatenate([lane, jnp.zeros(pad, jnp.int32)])
        val = jnp.concatenate([val, jnp.zeros(pad, val.dtype)])
    sb, sl, sv = jax.lax.sort((blk, lane, val), num_keys=1)
    sb = sb.reshape(nch, C)
    sl = sl.reshape(nch, C)
    sv = sv.reshape(nch, C)
    base = sb[:, 0]                                   # (nch,)
    rel = sb - base[:, None]                          # (nch, C)
    overflow = jnp.any((rel >= W) & (sb < B))
    relc = jnp.clip(rel, 0, W - 1)
    # kill overflowed/padded contributions (handled by fallback)
    svz = jnp.where((rel < W), sv, 0.0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (nch, W, C), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (nch, C, 128), 2)
    lane_hit = l_iota == sl[:, :, None]
    m2 = (w_iota == relc[:, None, :])
    if passes == 0:
        m2f = m2.astype(jnp.float32)
        m1 = jnp.where(lane_hit, svz[:, :, None], 0.0)
        part = jax.lax.dot_general(
            m2f, m1, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)       # (nch, W, 128)
    else:
        m2b = m2.astype(jnp.bfloat16)
        part = jnp.zeros((nch, W, 128), jnp.float32)
        for s_k in bf16_split(svz, passes):
            m1_k = jnp.where(lane_hit, s_k[:, :, None], jnp.bfloat16(0))
            part = part + jax.lax.dot_general(
                m2b, m1_k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
    rows = (base[:, None] + jnp.arange(W)[None, :]).reshape(-1)
    out2d = jnp.zeros((B + W, 128), jnp.float32).at[rows].add(
        part.reshape(nch * W, 128))
    fast = out2d.reshape(-1)[:n_out]
    # exact fallback on overflow
    return jax.lax.cond(
        overflow,
        lambda: event_scatter_add(tgt, val[:E] if pad else val, n_out),
        lambda: fast)


def timed(make, tgt, val, n_it):
    run = jax.jit(make(n_it))
    run1 = jax.jit(make(1))
    float(run(tgt, val))
    float(run1(tgt, val))
    best_n = best_1 = float('inf')
    for k in range(3):
        v = jnp.roll(val, k + 1)
        float(v[0])
        t0 = time.perf_counter(); float(run(tgt, v))
        best_n = min(best_n, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run1(tgt, v))
        best_1 = min(best_1, time.perf_counter() - t0)
    return (best_n - best_1) / (n_it - 1)


def bench(fn, E, n_out, n_it):
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.integers(0, n_out, E).astype(np.int32))
    val = jnp.asarray(rng.normal(size=E).astype(np.float32))

    def make(n):
        def run(tgt, val):
            def body(i, acc):
                v = jnp.roll(val, i)
                return acc + jnp.abs(fn(tgt, v, n_out))
            return jax.lax.fori_loop(
                0, n, body, jnp.zeros(n_out, jnp.float32)).sum()
        return run
    return timed(make, tgt, val, n_it) * 1e6


def correctness(E, n_out):
    rng = np.random.default_rng(1)
    tgt = rng.integers(0, n_out, E).astype(np.int32)
    val = rng.normal(size=E).astype(np.float32)
    ref = np.zeros(n_out, np.float64)
    np.add.at(ref, tgt, val.astype(np.float64))
    for W, passes in ((16, 0), (16, 3), (8, 0)):
        got = np.asarray(windowed_scatter(
            jnp.asarray(tgt), jnp.asarray(val), n_out, W=W, passes=passes))
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f'  correctness W={W} passes={passes}: rel err {err:.2e}',
              flush=True)


GRID = [(92160, 81920), (184320, 163840)]

if __name__ == '__main__':
    for E, n_out in GRID:
        row = {'E': E, 'n_out': n_out}
        row['onehot_or_xla_us'] = round(bench(
            lambda t, v, n: event_scatter_add(t, v, n), E, n_out, ITERS), 2)
        for W in (16, 32):
            f = functools.partial(windowed_scatter, C=512, W=W, passes=0)
            row[f'win{W}_us'] = round(bench(f, E, n_out, ITERS), 2)
        print(json.dumps(row), flush=True)
