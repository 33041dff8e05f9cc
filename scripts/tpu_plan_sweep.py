# Sweep GatherPlan (chunk, row_block, win_blocks, passes) on the real chip
# for the two load-bearing shapes: the 10M-synapse training ELL and the
# (10k,10k,1%) CSR microbench row. Uses the relay-proof fused-loop harness
# (iterations>1 + K-vs-1 differencing happen inside benchmark_function).
import itertools
import jax.numpy as jnp
import numpy as np
import jax

from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.ops.mxu_gather import build_gather_plan, gather_matvec

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)


def sweep(name, rows, cols, shape, grid):
    x = jnp.asarray(rng.random(shape[1]).astype(np.float32))
    data = jnp.asarray(rng.normal(size=rows.size).astype(np.float32))
    best = None
    for C, R, WB in grid:
        try:
            plan = build_gather_plan(rows, cols, shape, chunk=C,
                                     row_block=R, win_blocks=WB)
            w_sorted = plan.sort_data(data)
            for passes in (3, 2):
                res = benchmark_function(
                    lambda w, xx: gather_matvec(plan, w, xx, passes=passes),
                    w_sorted, x,
                    name=f'{name} C={C} R={R} WB={WB} p={passes}',
                    n_warmup=1, n_runs=3, verbose=True,
                    iterations=20, loop_arg=1)
                t = min(r.us_per_call for r in res.records) / 1e3
                if best is None or t < best[0]:
                    best = (t, f'C={C} R={R} WB={WB} p={passes}')
        except Exception as e:
            print(f'{name} C={C} R={R} WB={WB}: FAIL {type(e).__name__} '
                  f'{str(e)[:90]}', flush=True)
    print(f'BEST {name} {best[1]}: {best[0]:.3f} ms/call', flush=True)


import sys
if len(sys.argv) > 1 and sys.argv[1] == 'full':
    GRID = list(itertools.product((512, 1024), (256, 1024), (16, 32)))
else:
    GRID = [(1024, 1024, 32), (1024, 512, 32), (512, 256, 16),
            (1024, 1024, 16)]

# 1. training ELL: 100k x 100 -> (100k, 100k)
n, K = 100_000, 100
ell = rng.integers(0, n, (n, K))
sweep('ell10M', np.repeat(np.arange(n), K), ell.reshape(-1), (n, n), GRID)

# 2. CSR (10k, 10k, 1%) = 1M nse
m, nse = 10_000, 1_000_000
sweep('csr10k', np.sort(rng.integers(0, m, nse)),
      rng.integers(0, m, nse), (m, m), GRID)
