# Share of walk_setup (stationary-q rejection init, XLA) in the jitc
# slot-scan mv/mm pallas route: if setup dominates, hoisting it behind
# the class layer (structure is seed/shape-static) is the next lever.
# Uses the relay-proof fused-loop harness (benchmark_function).
import sys

import jax
import jax.numpy as jnp

from brainevent_tpu import JITCNormalR
from brainevent_tpu.jitc import engine
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu._misc import _MV_STRIDE, _normalize_chunk_size

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
prob = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100

print('devices:', jax.devices(), flush=True)
seed = 5
chunk = _normalize_chunk_size(n, None)


def setup_only(v):
    # v participates so the fused loop's rolled input forces re-execution
    _, _, _, state, q, cl = engine.walk_setup(
        v[0].astype(jnp.uint32) + seed, 2.0 / prob, n, n,
        _MV_STRIDE, chunk)
    return (state.sum().astype(jnp.float32) + q.sum().astype(jnp.float32)
            + v.sum())


v0 = jnp.ones((n,), jnp.float32)
r = benchmark_function(setup_only, v0, name=f'walk_setup[{n}]',
                       n_warmup=1, n_runs=3, iterations=iters,
                       loop_arg=0, verbose=False)
print(f'walk_setup ({n}x{n}): {r.records[0].us_per_call:.1f} us/call', flush=True)

m = JITCNormalR((0.0, 1.0, prob, seed), shape=(n, n))


def mv(v):
    return m @ v


r = benchmark_function(mv, v0, name=f'jitnmv[{n}]',
                       n_warmup=1, n_runs=3, iterations=iters,
                       loop_arg=0, verbose=False)
print(f'jitnmv route ({n}x{n}): {r.records[0].us_per_call:.1f} us/call', flush=True)

B = jnp.ones((n, 8), jnp.float32)


def mm(b):
    return m @ b


r = benchmark_function(mm, B, name=f'jitnmm[{n}]',
                       n_warmup=1, n_runs=3, iterations=iters,
                       loop_arg=0, verbose=False)
print(f'jitnmm route ({n}x{n},B=8): {r.records[0].us_per_call:.1f} us/call',
      flush=True)

# the walk-plan route: setup hoisted to build time
plan = m.build_walk_plan()


def mv_plan(v):
    return plan @ v


r = benchmark_function(mv_plan, v0, name=f'jitnmv_plan[{n}]',
                       n_warmup=1, n_runs=3, iterations=iters,
                       loop_arg=0, verbose=False)
print(f'jitnmv PLAN route ({n}x{n}): {r.records[0].us_per_call:.1f} us/call',
      flush=True)


def mm_plan(b):
    return plan @ b


r = benchmark_function(mm_plan, B, name=f'jitnmm_plan[{n}]',
                       n_warmup=1, n_runs=3, iterations=iters,
                       loop_arg=0, verbose=False)
print(f'jitnmm PLAN route ({n}x{n},B=8): {r.records[0].us_per_call:.1f} '
      f'us/call', flush=True)
