# stride-4 'mm'-layout slot-scan A/B: pallas kernel vs the XLA walk
# engine on the mm-mode products (jitnmm matrix_mode='mm', jitn
# materialize). K-vs-1 fused-loop differencing with rolled inputs
# (relay-proof), scalar read inside the clock, min over 3 runs.
#   python scripts/tpu_jitc_mm_layout_ab.py [n_it]
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.jitc import jitnmm
import brainevent_tpu as be

n_it = int(sys.argv[1]) if len(sys.argv) > 1 else 20
print('devices:', jax.devices(), flush=True)


def timed(make, n_it, *args):
    runk = jax.jit(make(n_it))
    run1 = jax.jit(make(1))
    float(runk(*args))
    float(run1(*args))
    bk = b1 = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(runk(*args))
        bk = min(bk, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run1(*args))
        b1 = min(b1, time.perf_counter() - t0)
    return (bk - b1) / (n_it - 1) * 1e6


def bench_mm(shape, prob, nb, backend):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(size=(shape[1], nb)).astype(np.float32))

    def make(n):
        def run(B):
            def body(i, acc):
                Bi = jnp.roll(B, i + 1, axis=0)
                out = jitnmm(0.5, 0.2, prob, Bi, 1234, shape=shape,
                             matrix_mode='mm', backend=backend)
                return acc + jnp.sum(jnp.abs(out))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    return timed(make, n_it, B)


def bench_dense(shape, prob, backend):
    def make(n):
        def run(s0):
            def body(i, acc):
                out = be.jitn(0.5, 0.2, prob, s0 + i, shape=shape,
                              matrix_mode='mm', backend=backend)
                return acc + jnp.sum(jnp.abs(out))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    return timed(make, n_it, jnp.uint32(7))


for shape, prob, nb in [((1000, 1000), 0.1, 8),
                        ((2000, 2000), 0.1, 8),
                        ((2000, 2000), 0.1, 1),
                        ((5000, 5000), 0.01, 8)]:
    for backend in ('jax_raw', 'pallas'):
        us = bench_mm(shape, prob, nb, backend)
        print(f'jitnmm[mm] {shape} p={prob} nb={nb} {backend}: '
              f'{us:.1f} us/call', flush=True)

for shape, prob in [((1000, 1000), 0.1), ((2000, 2000), 0.1)]:
    for backend in ('jax_raw', 'pallas'):
        us = bench_dense(shape, prob, backend)
        print(f'jitn[mm] todense {shape} p={prob} {backend}: '
              f'{us:.1f} us/call', flush=True)
print('DONE', flush=True)
