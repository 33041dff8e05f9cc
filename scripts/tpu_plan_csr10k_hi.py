# High-iteration rerun of the (10k,10k,1%) CSR GatherPlan row: at 20
# fused iterations the differenced per-call time is below the relay
# noise floor (plan sweep warning), so resolve it with 1000.
# Also times the jax_raw csrmv primitive on the same structure for the
# VERDICT-r2 #3 ratio, at 300 iterations (it is ~14 ms/call).
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.ops.mxu_gather import build_gather_plan, gather_matvec
from brainevent_tpu.csr.float import csrmv_p_call

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)

m, nse = 10_000, 1_000_000
rows = np.sort(rng.integers(0, m, nse))
cols = rng.integers(0, m, nse)
x = jnp.asarray(rng.random(m).astype(np.float32))
data = jnp.asarray(rng.normal(size=nse).astype(np.float32))

# CSR arrays for the primitive route
indptr = jnp.asarray(np.concatenate(
    [[0], np.cumsum(np.bincount(rows, minlength=m))]).astype(np.int32))
indices = jnp.asarray(cols.astype(np.int32))

for C, R, WB in ((1024, 1024, 32), (1024, 512, 32), (512, 256, 16)):
    plan = build_gather_plan(rows, cols, (m, m), chunk=C,
                             row_block=R, win_blocks=WB)
    w_sorted = plan.sort_data(data)
    for passes in (3, 2):
        benchmark_function(
            lambda w, xx: gather_matvec(plan, w, xx, passes=passes),
            w_sorted, x,
            name=f'csr10k-plan C={C} R={R} WB={WB} p={passes}',
            n_warmup=1, n_runs=3, verbose=True,
            iterations=1000, loop_arg=1)

benchmark_function(
    lambda w, xx: csrmv_p_call(w, indices, indptr, xx,
                               shape=(m, m), transpose=False)[0],
    data, x, name='csr10k-jax_raw csrmv', n_warmup=1, n_runs=3,
    verbose=True, iterations=300, loop_arg=1)
print('CSR10K HI DONE', flush=True)
