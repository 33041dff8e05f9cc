# HBM row-gather DMA microbenchmark: per-event cost of lr separate
# (1,128) row DMAs (mxu6's current gather) vs ONE (lr,128) block DMA at a
# dynamic, non-8-aligned sublane offset (the event-major candidate).
# Also answers whether Mosaic accepts the (lr,128) dynamic slice at all.
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brainevent_tpu._compat import pallas_tpu_params

LR = 3
NEV = 896          # events per inner round (mxu6 cap at 400k)
REPS = 200         # inner repetitions per device call
M = 400_128        # table rows (neurons)

print('devices:', jax.devices(), flush=True)

ids_np = np.random.default_rng(0).integers(0, M, NEV)
ids = jnp.asarray(ids_np, jnp.float32).reshape(NEV, 1)
table = jnp.arange(M * LR * 128, dtype=jnp.int32).reshape(M * LR, 128)


def make(mode):
    def kernel(ids_ref, tbl_ref, out_ref, rowbuf_ref, sem_ref):
        def rep(r, _):
            def gather8(g, _):
                if mode == 'rows':
                    def copy(j, t):
                        e = 8 * g + j
                        nid = ids_ref[e, 0].astype(jnp.int32)
                        return pltpu.make_async_copy(
                            tbl_ref.at[pl.ds(nid * LR + t, 1), :],
                            rowbuf_ref.at[pl.ds(t * NEV + e, 1), :],
                            sem_ref.at[j * LR + t])
                    cps = [copy(j, t) for j in range(8) for t in range(LR)]
                else:
                    def copy(j):
                        e = 8 * g + j
                        nid = ids_ref[e, 0].astype(jnp.int32)
                        return pltpu.make_async_copy(
                            tbl_ref.at[pl.ds(nid * LR, LR), :],
                            rowbuf_ref.at[pl.ds(e * LR, LR), :],
                            sem_ref.at[j])
                    cps = [copy(j) for j in range(8)]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                return 0
            jax.lax.fori_loop(0, NEV // 8, gather8, 0)
            return 0
        jax.lax.fori_loop(0, REPS, rep, 0)
        out_ref[0, 0] = rowbuf_ref[0, 0].astype(jnp.float32)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NEV * LR, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((8 * LR,))],
        compiler_params=pallas_tpu_params(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


for mode in ('rows', 'block'):
    try:
        f = jax.jit(lambda i, t, mode=mode: make(mode)(i, t))
        t0 = time.perf_counter()
        out = f(ids, table)
        float(out[0, 0])
        tc = time.perf_counter() - t0
        times = []
        for k in range(3):
            i2 = jnp.asarray(np.roll(ids_np, k + 1), jnp.float32
                             ).reshape(NEV, 1)
            t0 = time.perf_counter()
            out = f(i2, table)
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        per_ev = med / (REPS * NEV) * 1e9
        print(f'{mode:6s}: {per_ev:8.2f} ns/event  '
              f'({med*1e3:.1f} ms/call, compile {tc:.0f}s)', flush=True)
    except Exception as e:
        print(f'{mode:6s}: FAILED: {str(e)[:300]}', flush=True)
