# Focused re-sweep after the excess-precision split fix.
import time
import jax, jax.numpy as jnp
import numpy as np
from brainevent_tpu.ops.mxu_gather import (
    build_gather_plan, plan_from_ell, gather_matvec, gather_matvec_xla)
from brainevent_tpu.ops.benchmark import benchmark_function

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)

def bench(name, plan, data, x, iters=100):
    w_sorted = jax.block_until_ready(plan.sort_data(jnp.asarray(data)))
    xj = jnp.asarray(x)
    t0 = time.perf_counter()
    out = jax.block_until_ready(gather_matvec(plan, w_sorted, xj))
    ref = gather_matvec_xla(plan, w_sorted, xj)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f'{name}: rel err vs oracle {err:.2e}', flush=True)
    benchmark_function(
        lambda w, xx: gather_matvec(plan, w, xx), w_sorted, xj,
        name=name, n_warmup=1, n_runs=5, verbose=True,
        iterations=iters, loop_arg=1)

M = N = 10_000; E = 1_000_000
rows = np.sort(rng.integers(0, M, E)); cols = rng.integers(0, N, E)
data = rng.normal(size=E).astype(np.float32)
x = rng.normal(size=N).astype(np.float32)
for (C, R, WB) in [(512, 512, 16), (512, 1024, 16), (1024, 512, 32)]:
    plan = build_gather_plan(rows, cols, (M, N), chunk=C, row_block=R,
                             win_blocks=WB)
    print(f'[csrmv10k C={C} R={R} WB={WB}] chunks={plan.n_chunks} '
          f'pad={plan.n_chunks*C/E:.2f}', flush=True)
    bench(f'csrmv10k_C{C}_R{R}_W{WB}', plan, data, x, iters=200)

n, K = 100_000, 100
ell = rng.integers(0, n, (n, K))
d2 = rng.normal(size=(n, K)).astype(np.float32)
x2 = rng.normal(size=n).astype(np.float32)
for (C, R, WB) in [(1024, 512, 32), (1024, 1024, 32), (2048, 512, 64)]:
    plan = plan_from_ell(ell, (n, n), chunk=C, row_block=R, win_blocks=WB)
    print(f'[ell10M C={C} R={R} WB={WB}] chunks={plan.n_chunks} '
          f'pad={plan.n_chunks*C/(n*K):.2f}', flush=True)
    bench(f'ell10M_C{C}_R{R}_W{WB}', plan, d2, x2, iters=20)
