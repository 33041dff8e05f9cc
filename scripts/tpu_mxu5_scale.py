# mxu5 scaling on the real chip: 100k/200k/400k (+ compile time, VERDICT
# items 1 and 6). Round-2 mxu3 table: 69 / 153 / 492 us/step, compile
# 1574 s at 400k.
import sys
import time
import jax
import jax.numpy as jnp

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu5

print('devices:', jax.devices(), flush=True)

sizes = ((25.0, 10_000), (50.0, 5_000), (100.0, 5_000))
if len(sys.argv) > 1:
    pick = int(sys.argv[1])
    sizes = sizes[pick:pick + 1]

for scale, steps in sizes:
    net = EINet(scale=scale, coba=True, seed=42)
    s0 = net.init_state(jax.random.PRNGKey(0))
    n = net.num
    try:
        f = jax.jit(lambda st: einet_pallas_sim_mxu5(net, st, steps))
        t0 = time.perf_counter()
        out = f(s0)
        spikes = float(jnp.sum(out[4]))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(s0._replace(g_e=s0.g_e + 1e-6))
        spikes = float(jnp.sum(out[4]))
        dt = time.perf_counter() - t0
        print(f'mxu5 n={n}: {dt/steps*1e6:.2f} us/step ({steps} steps, '
              f'{spikes:.0f} spikes, compile+run1 {tc:.0f}s)', flush=True)
    except Exception as e:
        print(f'mxu5 n={n}: FAIL {type(e).__name__} {str(e)[:200]}',
              flush=True)
