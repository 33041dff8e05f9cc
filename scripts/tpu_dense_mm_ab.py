# Cached-dense mm crossover vs the segment-sum route at reference scale.
import json
import numpy as np, jax, jax.numpy as jnp
import brainevent_tpu as be
from brainevent_tpu.ops.benchmark import benchmark_function

rows = []
for n, dens, nb in ((5000, 0.01, 128), (10000, 0.01, 256)):
    rng = np.random.default_rng(0)
    per_row = int(n * dens)
    nse = n * per_row
    indices = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    indptr = jnp.asarray(np.arange(n + 1) * per_row, jnp.int32)
    w = jnp.asarray(rng.normal(size=nse), jnp.float32)
    B = jnp.asarray(rng.normal(size=(n, nb)), jnp.float32)
    A = be.CSR((w, indices, indptr), shape=(n, n))
    y_fast = A @ B            # dense route (auto on TPU)
    assert getattr(A, '_mxu_dense', None) is not None, 'dense route off'
    from brainevent_tpu.csr.float import csrmm
    y_ref = csrmm(w, indices, indptr, B, shape=(n, n))
    err = float(jnp.max(jnp.abs(y_fast - y_ref))
                / jnp.max(jnp.abs(y_ref)))
    print(f'n={n} rel err vs segment-sum: {err:.2e}', flush=True)
    for name, fn in (
        (f'csrmm_dense_route[m={n},k={n},dens={dens},B={nb},NT]',
         lambda b: A @ b),
        (f'csrmm_dense_route[m={n},k={n},dens={dens},B={nb},T]',
         lambda b: b.T @ A),
    ):
        r = benchmark_function(fn, B, name=name, iterations=100,
                               loop_arg=0, n_runs=3, n_warmup=2)
        rows.append(r.records[0].to_dict())
json.dump(rows, open('/tmp/dense_mm_rows.json', 'w'), indent=1)
