# Scatter-passes A/B on the live chip: the MXU one-hot scatter's value
# factor bf16 split (config.set_scatter_passes) vs the legacy HIGHEST
# (6-pass) f32 dot. Relay-proof: fused fori_loop with a per-iteration
# data dependence, (t(N) - t(1)) / (N - 1) differencing.
#
# Usage: python scripts/tpu_scatter_passes_ab.py [iters]
import sys
import time
import json

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from brainevent_tpu import config
from brainevent_tpu.ops.scatter import event_scatter_add

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 300

GRID = [
    # (E, n_out) — JITCNet-80k-like, tuner-grid-like, small
    (92160, 81920),
    (40960, 40960),
    (40960, 20480),
    (8192, 4096),
]


def bench(passes, E, n_out, iters):
    config.set_scatter_passes(passes)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.integers(0, n_out, E).astype(np.int32))
    val = jnp.asarray(rng.normal(size=E).astype(np.float32))

    def make(n_it):
        @jax.jit
        def run(tgt, val):
            # rolled inputs defeat loop-invariant hoisting; the abs()
            # accumulator defeats sum-through-matmul reassociation and
            # slice narrowing (a linear out[0] probe measured 0.0 us:
            # XLA narrowed the one-hot dot through the slice)
            def body(i, acc):
                v = jnp.roll(val, i)
                out = event_scatter_add(tgt, v, n_out)
                return acc + jnp.abs(out)
            acc = jax.lax.fori_loop(
                0, n_it, body, jnp.zeros(n_out, jnp.float32))
            return acc.sum()
        return run

    def timed(fn):
        # every timed call gets a UNIQUE input: byte-identical repeats
        # are served from the relay cache (the vary_runs trap,
        # ops/benchmark.py). Completion is forced by a scalar HOST read
        # — on the axon relay block_until_ready() returns early.
        float(fn(tgt, val))
        best = float('inf')
        for k in range(3):
            v = jnp.roll(val, k + 1)
            float(v[0])
            t0 = time.perf_counter()
            float(fn(tgt, v))
            best = min(best, time.perf_counter() - t0)
        return best

    t_n = timed(make(iters))
    t_1 = timed(make(1))
    per_call = (t_n - t_1) / (iters - 1)
    return per_call


for E, n_out in GRID:
    row = {'E': E, 'n_out': n_out, 'iters': ITERS}
    for passes in (6, 3, 2):
        us = bench(passes, E, n_out, ITERS) * 1e6
        row[f'p{passes}_us'] = round(us, 2)
        row[f'p{passes}_ns_per_event'] = round(us * 1e3 / E, 3)
    print(json.dumps(row), flush=True)
