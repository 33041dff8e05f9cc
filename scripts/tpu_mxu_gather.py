# MXU blocked-gather kernel: Mosaic compile + perf on the VERDICT shapes.
# Row (10k,10k,1%) csrmv target <= 1.5 ms (BENCH_PRIMS r02: 14.5 ms XLA);
# ELL (100k x 100) = 10M synapses is the training dspk shape.
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
    # correctness first (vs XLA oracle route)
    t0 = time.perf_counter()
    out = jax.block_until_ready(gather_matvec(plan, w_sorted, xj))
    print(f'{name}: first call (compile) {time.perf_counter()-t0:.1f}s',
          flush=True)
    ref = gather_matvec_xla(plan, w_sorted, xj)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f'{name}: rel err vs oracle {err:.2e}', flush=True)
    r = benchmark_function(
        lambda w, xx: gather_matvec(plan, w, xx), w_sorted, xj,
        name=name, n_warmup=1, n_runs=5, verbose=True,
        iterations=iters, loop_arg=1)
    r2 = benchmark_function(
        lambda w, xx: gather_matvec_xla(plan, w, xx), w_sorted, xj,
        name=name+'_xla', n_warmup=1, n_runs=5, verbose=True,
        iterations=max(iters // 10, 2), loop_arg=1)

# 1. csrmv (10k, 10k, 1%) = 1M nnz
M = N = 10_000; E = 1_000_000
rows = np.sort(rng.integers(0, M, E)); cols = rng.integers(0, N, E)
data = rng.normal(size=E).astype(np.float32)
x = rng.normal(size=N).astype(np.float32)
for (C, R, WB) in [(512, 256, 16), (512, 512, 16), (1024, 256, 16),
                   (512, 256, 32)]:
    plan = build_gather_plan(rows, cols, (M, N), chunk=C, row_block=R,
                             win_blocks=WB)
    print(f'[csrmv10k C={C} R={R} WB={WB}] chunks={plan.n_chunks} '
          f'pad={plan.n_chunks*C/E:.2f}', flush=True)
    bench(f'csrmv10k_C{C}_R{R}_W{WB}', plan, data, x, iters=200)

# 2. training dspk: ELL (100k, 100) -> 10M
n, K = 100_000, 100
ell = rng.integers(0, n, (n, K))
d2 = rng.normal(size=(n, K)).astype(np.float32)
x2 = rng.normal(size=n).astype(np.float32)
for (C, R, WB) in [(512, 256, 16), (1024, 512, 32)]:
    plan = plan_from_ell(ell, (n, n), chunk=C, row_block=R, win_blocks=WB)
    print(f'[ell10M C={C} R={R} WB={WB}] chunks={plan.n_chunks} '
          f'pad={plan.n_chunks*C/(n*K):.2f}', flush=True)
    bench(f'ell10M_C{C}_R{R}_W{WB}', plan, d2, x2, iters=20)
