# Round-3 measurements, part 2 (after the uint32->float32 Mosaic cast fix):
# jitn/jitu pallas, scatter direction, binary gating, and mxu5 vs mxu3.
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.jitc import jitnmv, jitumv, binary_jitnmv

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)


def safe(label, fn):
    try:
        fn()
    except Exception as e:
        print(f'{label}: FAIL {type(e).__name__} {str(e)[:120]}', flush=True)


for f, params, label in ((jitnmv, (0.5, 0.2), 'jitnmv'),
                         (jitumv, (0.1, 0.9), 'jitumv')):
    for shape, prob in (((1000, 1000), 0.1), ((10000, 10000), 0.01)):
        v = jnp.asarray(rng.normal(size=shape[1]).astype(np.float32))
        safe(f'{label}{shape}', lambda f=f, p=params, pr=prob, s=shape,
             vv=v: benchmark_function(
                 lambda x: f(*p, pr, x, 7, shape=s, corder=True,
                             backend='pallas'),
                 vv, name=f'{label}[{s[0]}x{s[1]},p={pr}][pallas]',
                 n_warmup=1, n_runs=3, verbose=True, iterations=50,
                 loop_arg=0))

v1 = jnp.asarray(rng.normal(size=1000).astype(np.float32))
for backend in ('pallas',):
    safe('corderF', lambda b=backend: benchmark_function(
        lambda x: jitnmv(0.5, 0.2, 0.1, x, 7, shape=(1000, 1000),
                         corder=False, backend=b),
        v1, name=f'jitnmv[1k,corder=F][{b}]',
        n_warmup=1, n_runs=3, verbose=True, iterations=50, loop_arg=0))

s1 = jnp.asarray(rng.random(1000) < 0.1)
for backend in ('jax_raw', 'pallas'):
    safe('binary', lambda b=backend: benchmark_function(
        lambda x: binary_jitnmv(0.5, 0.2, 0.1, x, 7, shape=(1000, 1000),
                                backend=b),
        s1, name=f'binary_jitnmv[1k][{b}]',
        n_warmup=1, n_runs=3, verbose=True, iterations=1))

# ---- mxu5 vs mxu3 at 4k and 40k ----------------------------------------
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import (einet_pallas_sim_mxu3,
                                              einet_pallas_sim_mxu5)

for scale, steps in ((1.0, 100_000), (10.0, 20_000)):
    net = EINet(scale=scale, coba=True, seed=42)
    s0 = net.init_state(jax.random.PRNGKey(0))
    n = net.num
    for tag, sim in (('mxu3', einet_pallas_sim_mxu3),
                     ('mxu5', einet_pallas_sim_mxu5)):
        def run(tag=tag, sim=sim, net=net, s0=s0, steps=steps, n=n):
            f = jax.jit(lambda st: sim(net, st, steps))
            t0 = time.perf_counter()
            out = f(s0)
            spikes = float(jnp.sum(out[4]))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = f(s0._replace(g_e=s0.g_e + 1e-6))
            spikes = float(jnp.sum(out[4]))
            dt = time.perf_counter() - t0
            print(f'{tag} n={n}: {dt/steps*1e6:.2f} us/step '
                  f'({steps} steps, {spikes:.0f} spikes, '
                  f'compile+run1 {tc:.0f}s)', flush=True)
        safe(f'{tag} n={n}', run)
