# Sweep GatherPlan (chunk, row_block, win_blocks, passes) on the real chip
# for the two load-bearing shapes: the 10M-synapse training ELL and the
# (10k,10k,1%) CSR microbench row. Result feeds build_gather_plan defaults.
import itertools
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.ops.mxu_gather import build_gather_plan, gather_matvec

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)


def bench(plan, w_sorted, x, passes, n=5):
    f = jax.jit(lambda w, xx: gather_matvec(plan, w, xx, passes=passes))
    y = f(w_sorted, x)
    _ = float(jnp.sum(y))
    ts = []
    for k in range(n):
        xx = jnp.roll(x, k + 1)
        t0 = time.perf_counter()
        y = f(w_sorted, xx)
        _ = float(jnp.sum(y))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sweep(name, rows, cols, shape):
    x = jnp.asarray(rng.random(shape[1]).astype(np.float32))
    data = jnp.asarray(rng.normal(size=rows.size).astype(np.float32))
    best = None
    for C, R, WB in itertools.product((512, 1024), (256, 512, 1024),
                                      (8, 16, 32)):
        try:
            plan = build_gather_plan(rows, cols, shape, chunk=C,
                                     row_block=R, win_blocks=WB)
            w_sorted = plan.sort_data(data)
            for passes in (3, 2):
                t = bench(plan, w_sorted, x, passes)
                tag = f'{name} C={C} R={R} WB={WB} p={passes}'
                print(f'{tag}: {t*1e3:.2f} ms', flush=True)
                if best is None or t < best[0]:
                    best = (t, tag)
        except Exception as e:
            print(f'{name} C={C} R={R} WB={WB}: FAIL {type(e).__name__} '
                  f'{str(e)[:80]}', flush=True)
    print(f'BEST {best[1]}: {best[0]*1e3:.2f} ms', flush=True)


# 1. training ELL: 100k x 100 -> (100k, 100k)
n, K = 100_000, 100
ell = rng.integers(0, n, (n, K))
rows = np.repeat(np.arange(n), K)
cols = ell.reshape(-1)
sweep('ell10M', rows, cols, (n, n))

# 2. CSR (10k, 10k, 1%) = 1M nse
m = 10_000
nse = 1_000_000
rows2 = np.sort(rng.integers(0, m, nse))
cols2 = rng.integers(0, m, nse)
sweep('csr10k', rows2, cols2, (m, m))
