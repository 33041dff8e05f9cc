# VERDICT r3 item 2: grad through `CSR @ v` via the lazily auto-built
# MXU plan pair (custom VJP) vs the XLA csrmv route. (10k,10k,1%) per
# the verdict's acceptance shape; relay-proof fused-loop differencing.
import json
import numpy as np, jax, jax.numpy as jnp
import brainevent_tpu as be
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.csr.float import csrmv

n, conn = 10000, 0.01
nse = int(n * n * conn)
rng = np.random.default_rng(0)
indices = np.asarray(rng.integers(0, n, nse), np.int32)
counts = np.full(n, nse // n); counts[:nse % n] += 1
indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
w = jnp.asarray(rng.normal(size=nse), jnp.float32)
v = jnp.asarray(rng.normal(size=n), jnp.float32)
ind_j, ptr_j = jnp.asarray(indices), jnp.asarray(indptr)

A = be.CSR((w, ind_j, ptr_j), shape=(n, n))
# NO manual build_mxu_plan: the first product must auto-build on TPU
u = jnp.asarray(rng.normal(size=n), jnp.float32)
y = A @ v
assert getattr(A, '_mxu_plans', None) is not None, 'auto-build did not fire'
ref = csrmv(w, ind_j, ptr_j, v, shape=(n, n))
err = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
print('fwd rel err vs XLA:', err)

rows = []
def rec(r):
    rows.append(r.records[0].to_dict())

# 1. forward through the auto plan (class route)
rec(benchmark_function(lambda v_: A @ v_, v, name='csrmv_auto_plan_fwd[10k,1%]',
                       iterations=200, loop_arg=0, n_runs=3, n_warmup=2))
# 2. grad wrt v through the plan pair (custom VJP)
g_plan = jax.jit(jax.grad(lambda v_: jnp.vdot(A @ v_, u)))
g_xla = jax.jit(jax.grad(lambda v_: jnp.vdot(csrmv(w, ind_j, ptr_j, v_, shape=(n, n)), u)))
gerr = float(jnp.max(jnp.abs(g_plan(v) - g_xla(v))) / jnp.max(jnp.abs(g_xla(v))))
print('grad-v rel err vs XLA:', gerr)
rec(benchmark_function(g_plan, v, name='csrmv_grad_v[10k,1%][plan_vjp]',
                       iterations=100, loop_arg=0, n_runs=3, n_warmup=2))
rec(benchmark_function(g_xla, v, name='csrmv_grad_v[10k,1%][jax_raw]',
                       iterations=20, loop_arg=0, n_runs=3, n_warmup=2))
# 3. grad wrt (w, v) on the XLA route (the traced-data fallback, unchanged)
g_wv = jax.jit(jax.grad(lambda w_, v_: jnp.vdot(csrmv(w_, ind_j, ptr_j, v_, shape=(n, n)), u), argnums=(0, 1)))
rec(benchmark_function(lambda w_, v_: g_wv(w_, v_)[0], w, v,
                       name='csrmv_grad_wv[10k,1%][jax_raw]',
                       iterations=20, loop_arg=1, n_runs=3, n_warmup=2))
json.dump(rows, open('/tmp/grad_rows_r4.json', 'w'), indent=1)
