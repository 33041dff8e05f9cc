# fori-factors hardware validation (VERDICT r2 #6 / ROADMAP item 2):
# compile time + runtime of mxu3 factors='fori' vs 'unrolled' at scale.
# Protocol: fresh process per config (pass mode+size via argv), warm on
# state A, 3 timed runs on DISTINCT states, value read inside the clock.
import sys
import time
import jax
import jax.numpy as jnp

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

mode = sys.argv[1] if len(sys.argv) > 1 else 'fori'       # fori | unrolled
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
capdiv = int(sys.argv[4]) if len(sys.argv) > 4 else 448

print('devices:', jax.devices(), flush=True)

net = EINet(scale=scale, coba=True, seed=42)
s0 = net.init_state(jax.random.PRNGKey(0))
n = net.num

f = jax.jit(lambda st: einet_pallas_sim_mxu3(net, st, steps,
                                             factors=mode,
                                             cap_divisor=capdiv))
t0 = time.perf_counter()
out = f(s0)
warm_spikes = float(jnp.sum(out[4]))
tc = time.perf_counter() - t0
print(f'mxu3[{mode}] n={n}: compile+run1 {tc:.0f}s '
      f'({warm_spikes:.0f} spikes)', flush=True)

times = []
for i in range(3):
    si = s0._replace(g_e=s0.g_e + 1e-6 * (i + 1))
    t0 = time.perf_counter()
    out = f(si)
    spikes = float(jnp.sum(out[4]))          # value read forces completion
    times.append(time.perf_counter() - t0)
    print(f'  run{i}: {times[-1]/steps*1e6:.2f} us/step '
          f'({spikes:.0f} spikes)', flush=True)

med = sorted(times)[1]
print(f'mxu3[{mode}] n={n}: median {med/steps*1e6:.2f} us/step '
      f'({steps} steps)', flush=True)
