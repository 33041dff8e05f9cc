# Round-3 kernel measurements on the real chip:
# 1. JITC slot-scan pallas vs jax_raw walk (VERDICT item 4 target:
#    jitnmv (1k,1k,10%) <= 500 us; BENCH_PRIMS r2: 3.6-6.5 ms).
# 2. mxu5 channel-split mega-kernel at 40k vs mxu3 (VERDICT item 1).
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.jitc import jitsmv, jitnmv, jitumv, binary_jitnmv

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)

# ---- 1. JITC mv: pallas vs jax_raw --------------------------------------
for fn, params, label in ((jitsmv, (1.5,), 'jitsmv'),
                          (jitnmv, (0.5, 0.2), 'jitnmv'),
                          (jitumv, (0.1, 0.9), 'jitumv')):
    for shape, prob in (((1000, 1000), 0.1), ((10000, 10000), 0.01)):
        v = jnp.asarray(rng.normal(size=shape[1]).astype(np.float32))
        for backend in ('jax_raw', 'pallas'):
            try:
                benchmark_function(
                    lambda vv, _f=fn, _p=params, _pr=prob, _s=shape,
                    _b=backend: _f(*_p, _pr, vv, 7, shape=_s, corder=True,
                                   backend=_b),
                    v,
                    name=f'{label}[{shape[0]}x{shape[1]},p={prob}]'
                         f'[{backend}]',
                    n_warmup=1, n_runs=3, verbose=True,
                    iterations=50, loop_arg=0)
            except Exception as e:
                print(f'{label} {shape} {backend}: FAIL '
                      f'{type(e).__name__} {str(e)[:100]}', flush=True)

# corder=False (scatter direction) and binary gating, 1k only
v1 = jnp.asarray(rng.normal(size=1000).astype(np.float32))
for backend in ('jax_raw', 'pallas'):
    benchmark_function(
        lambda vv, _b=backend: jitnmv(0.5, 0.2, 0.1, vv, 7,
                                      shape=(1000, 1000), corder=False,
                                      backend=_b),
        v1,
        name=f'jitnmv[1k,corder=F][{backend}]',
        n_warmup=1, n_runs=3, verbose=True, iterations=50, loop_arg=0)
s1 = jnp.asarray(rng.random(1000) < 0.1)
for backend in ('jax_raw', 'pallas'):
    benchmark_function(
        lambda ss, _b=backend: binary_jitnmv(0.5, 0.2, 0.1, ss, 7,
                                             shape=(1000, 1000),
                                             backend=_b),
        s1,
        name=f'binary_jitnmv[1k][{backend}]',
        n_warmup=1, n_runs=3, verbose=True, iterations=1)

# ---- 2. mxu5 vs mxu3 at 4k and 40k --------------------------------------
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import (einet_pallas_sim_mxu3,
                                              einet_pallas_sim_mxu5)

for scale, steps in ((1.0, 100_000), (10.0, 20_000)):
    net = EINet(scale=scale, coba=True, seed=42)
    s0 = net.init_state(jax.random.PRNGKey(0))
    n = net.num
    for tag, sim in (('mxu3', einet_pallas_sim_mxu3),
                     ('mxu5', einet_pallas_sim_mxu5)):
        f = jax.jit(lambda st, _sim=sim: _sim(net, st, steps))
        t0 = time.perf_counter()
        out = f(s0)
        spikes = float(jnp.sum(out[4]))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(s0._replace(g_e=s0.g_e + 1e-6))
        spikes = float(jnp.sum(out[4]))
        dt = time.perf_counter() - t0
        print(f'{tag} n={n}: {dt/steps*1e6:.2f} us/step '
              f'({steps} steps, {spikes:.0f} spikes, compile+run1 {tc:.0f}s)',
              flush=True)
