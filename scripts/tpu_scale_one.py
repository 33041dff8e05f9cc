# One (strategy, scale, steps) measurement in a fresh process - the
# authoritative protocol: warm on state A, time 3 calls on states B,C,D
# (distinct bytes - the relay caches byte-identical execute calls), value
# read inside the clock, report min.
import sys
import time
import jax
import jax.numpy as jnp

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models import pallas_sim

strategy = sys.argv[1]
scale = float(sys.argv[2])
steps = int(sys.argv[3])

sim = getattr(pallas_sim, f'einet_pallas_sim_{strategy}')
net = EINet(scale=scale, coba=True, seed=42)
n = net.num
f = jax.jit(lambda st: sim(net, st, steps))

t0 = time.perf_counter()
out = f(net.init_state(jax.random.PRNGKey(0)))
spikes = float(jnp.sum(out[4]))
tc = time.perf_counter() - t0

times = []
for k in (1, 2, 3):
    s = net.init_state(jax.random.PRNGKey(k))
    t0 = time.perf_counter()
    out = f(s)
    spikes = float(jnp.sum(out[4]))
    times.append(time.perf_counter() - t0)

best = min(times)
print(f'{strategy} n={n}: {best/steps*1e6:.2f} us/step  '
      f'(runs {[round(t/steps*1e6, 2) for t in times]}, {steps} steps, '
      f'{spikes:.0f} spikes, compile+run1 {tc:.0f}s)', flush=True)
