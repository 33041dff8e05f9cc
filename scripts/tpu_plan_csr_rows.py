# Measure the plan-backed float csrmv route (CSR.build_mxu_plan ->
# plan_matvec) at the BENCH_PRIMS reference rows, to quantify the
# VERDICT-r2 #3 claim (14.5 ms XLA scatter -> plan route) with the
# relay-proof fused-loop harness. NT and T directions.
import sys
import numpy as np
import jax
import jax.numpy as jnp

from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.ops.mxu_gather import (build_gather_plan, plan_matvec)
from brainevent_tpu.csr.float import csrmv_p_call

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)

ROWS = [(1_000, 0.10), (10_000, 0.01)]
for n, conn in ROWS:
    nnz = int(n * n * conn)
    # uniform random structure, CSR-style sorted rows
    flat = rng.choice(n * n, size=nnz, replace=False)
    flat.sort()
    r = (flat // n).astype(np.int32)
    c = (flat % n).astype(np.int32)
    data = jnp.asarray(rng.normal(size=nnz).astype(np.float32))
    x = jnp.asarray(rng.random(n).astype(np.float32))

    plan = build_gather_plan(r, c, (n, n))
    w_s = plan.sort_data(data)
    res = benchmark_function(
        lambda w, xx: plan_matvec(plan, w, xx),
        w_s, x, name=f'plan csrmv[{n},{conn}] NT',
        n_warmup=1, n_runs=3, verbose=True, iterations=20, loop_arg=1)
    print(f'PLAN NT n={n} conn={conn}: '
          f'{min(rr.us_per_call for rr in res.records):.1f} us/call',
          flush=True)

    plan_t = build_gather_plan(c, r, (n, n))
    w_t = plan_t.sort_data(data)
    res = benchmark_function(
        lambda w, xx: plan_matvec(plan_t, w, xx),
        w_t, x, name=f'plan csrmv[{n},{conn}] T',
        n_warmup=1, n_runs=3, verbose=True, iterations=20, loop_arg=1)
    print(f'PLAN T  n={n} conn={conn}: '
          f'{min(rr.us_per_call for rr in res.records):.1f} us/call',
          flush=True)

    # XLA scatter baseline (the jax_raw csrmv primitive) for the same row
    indptr = jnp.asarray(np.searchsorted(r, np.arange(n + 1)).astype(np.int32))
    idx = jnp.asarray(c)
    res = benchmark_function(
        lambda w, xx: csrmv_p_call(w, idx, indptr, xx, shape=(n, n),
                                   transpose=False)[0],
        data, x, name=f'xla csrmv[{n},{conn}] NT',
        n_warmup=1, n_runs=3, verbose=True, iterations=20, loop_arg=1)
    print(f'XLA  NT n={n} conn={conn}: '
          f'{min(rr.us_per_call for rr in res.records):.1f} us/call',
          flush=True)
print('PLAN CSR ROWS DONE', flush=True)
