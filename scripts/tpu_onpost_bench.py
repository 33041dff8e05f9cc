# on_post / on_pre pallas-vs-jax_raw on the real chip (relay-proof
# fused-loop differencing). Run: python scripts/tpu_onpost_bench.py
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp, jax
print('devices:', jax.devices(), flush=True)
from brainevent_tpu.csr.plasticity import csr2csc_on_post_prim_call, csr_on_pre_prim_call
from brainevent_tpu.ops.benchmark import benchmark_function
rng = np.random.default_rng(0)
n, conn = 1000, 0.1
nse = int(n*n*conn)
indices = jnp.asarray(rng.integers(0, n, nse), np.int32)
counts = np.full(n, nse // n)
indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), np.int32)
w = jnp.asarray(rng.normal(size=nse), np.float32)
tr = jnp.asarray(rng.normal(size=n), np.float32)
spk = jnp.asarray(rng.random(n) < 0.01)
for backend in ('jax_raw', 'pallas'):
    benchmark_function(
        lambda ww: csr2csc_on_post_prim_call(ww, indices, indptr, None, tr, spk,
                                             shape=(n,n), backend=backend)[0],
        w, name=f'on_post {backend}', n_warmup=1, n_runs=3,
        iterations=300, verbose=True)
    benchmark_function(
        lambda ww: csr_on_pre_prim_call(ww, indices, indptr, spk, tr,
                                        shape=(n,n), backend=backend)[0],
        w, name=f'on_pre {backend}', n_warmup=1, n_runs=3,
        iterations=300, verbose=True)
print('DONE', flush=True)
