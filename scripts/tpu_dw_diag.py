# What makes _event_dw slow: nonzero? gathers? scatter? And how does it
# scale with dw_cap? Informs the training model's dw route.
import time
import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)
n, K = 100_000, 100
idx = jnp.asarray(rng.integers(0, n, (n, K)), dtype=jnp.int32)
ct = jnp.asarray(rng.random(n).astype(np.float32))
spk = jnp.asarray((rng.random(n) < 0.01).astype(np.float32))


def timeit(name, f, *args, n_runs=5):
    out = f(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for k in range(n_runs):
        a = (jnp.roll(args[0], k + 1),) + args[1:]
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {min(ts)*1e3:.2f} ms', flush=True)


# pieces
timeit('nonzero(size=6250)',
       jax.jit(lambda s: jnp.nonzero(s > 0, size=6250, fill_value=n)[0]), spk)
timeit('nonzero(size=1024)',
       jax.jit(lambda s: jnp.nonzero(s > 0, size=1024, fill_value=n)[0]), spk)
timeit('cumsum(100k)', jax.jit(lambda s: jnp.cumsum(s)), spk)

ids = jnp.nonzero(spk > 0, size=1024, fill_value=n)[0]
safe = jnp.where(ids < n, ids, 0)
timeit('tbl=idx[ids] (1024x100)', jax.jit(lambda s: idx[s]), safe)
tbl = idx[safe]
timeit('ct[tbl] (1024x100)', jax.jit(lambda c: c[tbl]), ct)
vals = ct[tbl]
timeit('scatter set (1024 rows)',
       jax.jit(lambda v: jnp.zeros((n, K), jnp.float32).at[safe].set(v)),
       vals)


# full dw at several caps
def dw_fn(cap):
    def f(s, c):
        (i2,) = jnp.nonzero(s > 0, size=cap, fill_value=n)
        valid = i2 < n
        sf = jnp.where(valid, i2, 0)
        t2 = idx[sf]
        v2 = jnp.where(valid[:, None], c[t2], 0.0)
        rows = jnp.where(valid, i2, n)
        return jnp.zeros((n, K), jnp.float32).at[rows].set(v2, mode='drop')
    return jax.jit(f)


for cap in (6250, 2048, 1024):
    timeit(f'event_dw cap={cap}', dw_fn(cap), spk, ct)

# compaction-free alternative: full-table mask product
timeit('full dw = spk[:,None]*ct[idx]',
       jax.jit(lambda s, c: s[:, None] * c[idx]), spk, ct)
