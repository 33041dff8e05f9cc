# VERDICT r3 item 4: pair-gather MXU kernels vs XLA gathers for the
# plasticity/dt2t family. n=1k/nse=100k is the verdict's acceptance row.
import json
import numpy as np, jax, jax.numpy as jnp
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.csr.plasticity import (update_csr_on_binary_pre,
                                           update_csr_on_binary_post)
from brainevent_tpu.csr.dt2t import csrmv_dt2t

rows = []
def run(fn, args, name, loop_arg, iters=500):
    for be_ in ('jax_raw', 'pallas'):
        r = benchmark_function(fn, *args, backend=be_,
                               name=f'{name}[{be_}]', iterations=iters,
                               loop_arg=loop_arg, n_runs=3, n_warmup=2)
        rows.append(r.records[0].to_dict())

for n, conn in ((1000, 0.1), (10000, 0.01)):
    nse = int(n * n * conn)
    rng = np.random.default_rng(0)
    indices = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    counts = np.full(n, nse // n); counts[:nse % n] += 1
    indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), jnp.int32)
    w = jnp.asarray(rng.normal(size=nse), jnp.float32)
    spk = jnp.asarray(rng.random(n) < 0.01)
    tr = jnp.asarray(rng.normal(size=n), jnp.float32)
    wi = jnp.arange(nse, dtype=jnp.int32)
    tag = f'n={n},nse={nse//1000}k'
    run(lambda w_, s_, t_, b=None, backend=None: update_csr_on_binary_pre(
            w_, indices, indptr, s_, t_, shape=(n, n), backend=backend),
        (w, spk, tr), f'update_csr_on_binary_pre[{tag}]', 2)
    run(lambda w_, t_, s_, backend=None: update_csr_on_binary_post(
            w_, indices, indptr, wi, t_, s_, shape=(n, n), backend=backend),
        (w, tr, spk), f'update_csr_on_binary_post[{tag}]', 1)
    run(lambda y_, w_, backend=None: csrmv_dt2t(
            y_, w_, indices, indptr, shape=(n, n), transpose=False,
            backend=backend),
        (tr, w), f'csrmv_dt2t[{tag},NT]', 0)
    run(lambda y_, w_, backend=None: csrmv_dt2t(
            y_, w_, indices, indptr, shape=(n, n), transpose=True,
            backend=backend),
        (tr, w), f'csrmv_dt2t[{tag},T]', 0)

json.dump(rows, open('/tmp/pair_rows_r4.json', 'w'), indent=1)
