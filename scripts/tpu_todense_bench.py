# Measure the Mosaic slot-scan materialize (jits/jitn/jitu todense,
# backend='pallas') against the XLA walk engine on the real chip.
# Relay-proof fused-loop harness (K-vs-1 differencing inside
# benchmark_function); seeds vary per fused iteration via loop over the
# params? Materialize has scalar inputs only, so the differencing run
# carries the anti-cache burden (iterations>1).
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from brainevent_tpu.jitc import jits, jitn, jitu
from brainevent_tpu.ops.benchmark import benchmark_function

print('devices:', jax.devices(), flush=True)

ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 50

CASES = [
    ('jits', jits, (1.5,)),
    ('jitn', jitn, (0.5, 0.2)),
    ('jitu', jitu, (0.1, 0.9)),
]
SHAPES = [((1000, 1000), 0.1), ((2000, 2000), 0.1), ((5000, 5000), 0.01)]

for (shape, prob) in SHAPES:
    for name, fn, params in CASES:
        for backend in ('jax_raw', 'pallas'):
            def call(seed, _fn=fn, _p=params, _s=shape, _pr=prob,
                     _b=backend):
                # consume the dense result into a scalar so the fused
                # loop cannot be narrowed by XLA
                d = _fn(*_p, _pr, seed, shape=_s, backend=_b)
                return jnp.sum(jnp.abs(d))
            try:
                res = benchmark_function(
                    call, jnp.uint32(42),
                    name=f'{name} {shape} p={prob} {backend}',
                    n_warmup=1, n_runs=3, verbose=True,
                    iterations=ITER)
            except Exception as e:
                print(f'{name} {shape} {backend}: FAIL '
                      f'{type(e).__name__} {str(e)[:120]}', flush=True)
