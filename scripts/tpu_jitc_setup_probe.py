# Share of walk_setup (stationary-q rejection init, XLA) in the jitc
# slot-scan mv/mm pallas route: if setup dominates, hoisting it behind
# the class layer (structure is seed/shape-static) is the next lever.
# K-vs-1 fused-loop differencing, forced value reads.
import sys
import time

import jax
import jax.numpy as jnp

from brainevent_tpu.jitc import engine
from brainevent_tpu._misc import _MV_STRIDE, _normalize_chunk_size

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
prob = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 200

print('devices:', jax.devices(), flush=True)
seed = 42
clen = 2.0 / prob
chunk = _normalize_chunk_size(n, None)


def setup_only(s):
    _, _, _, state, q, cl = engine.walk_setup(s, clen, n, n,
                                              _MV_STRIDE, chunk)
    return state.sum() + q.sum()


def bench(fn, arg, k):
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, k, lambda i, c: c + fn(a + i), jnp.uint32(0) + 0))
    out = jax.block_until_ready(f(arg))          # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(arg))
    return time.perf_counter() - t0


for k in (1, iters):
    t = bench(setup_only, jnp.uint32(seed), k)
    print(f'setup k={k}: {t*1e3:.2f} ms', flush=True)
t1 = bench(setup_only, jnp.uint32(seed), 1)
tk = bench(setup_only, jnp.uint32(seed), iters)
per = (tk - t1) / (iters - 1)
print(f'walk_setup ({n}x{n}): {per*1e6:.1f} us/call', flush=True)

# full mv through the family route for comparison (same-day)
from brainevent_tpu.jitc.classes import JITCNormal  # noqa: E402

m = JITCNormal(0.0, 1.0, prob, shape=(n, n), seed=seed, corder=True)
v = jnp.ones((n,), jnp.float32)


def mv(s):
    return (m @ (v + s)).sum()


t1 = bench(mv, jnp.float32(0.0), 1)
tk = bench(mv, jnp.float32(0.0), iters)
per = (tk - t1) / (iters - 1)
print(f'jitnmv pallas-route ({n}x{n}): {per*1e6:.1f} us/call', flush=True)
