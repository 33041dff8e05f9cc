# JITCNet (implicit-connectivity EI net) per-step time at one scale —
# fresh-process protocol: warm on state A, time 3 runs on distinct
# states B,C,D (relay caches byte-identical execute calls), value read
# inside the clock, report min.
#   python scripts/tpu_jitc_net.py <scale> <steps> [weight_law]
import sys
import time

import jax
import jax.numpy as jnp

from brainevent_tpu.models import JITCNet

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
law = sys.argv[3] if len(sys.argv) > 3 else 'normal'
cap_div = int(sys.argv[4]) if len(sys.argv) > 4 else 128

print('devices:', jax.devices(), flush=True)
net = JITCNet(scale=scale, weight_law=law, cap_divisor=cap_div)
print(f'n={net.num} law={law} scan_rounds={net.plan_e.scan_rounds} '
      f'cap_e={net.plan_e.event_cap} cap_i={net.plan_i.event_cap}',
      flush=True)
f = jax.jit(lambda st: net.run(steps, state=st))

t0 = time.perf_counter()
out = f(net.init_state(jax.random.PRNGKey(0)))
spikes = float(jnp.sum(out.spike_count))
tc = time.perf_counter() - t0

times = []
for k in (1, 2, 3):
    s = net.init_state(jax.random.PRNGKey(k))
    t0 = time.perf_counter()
    out = f(s)
    spikes = float(jnp.sum(out.spike_count))
    times.append(time.perf_counter() - t0)

best = min(times)
rate = spikes / net.num / (steps * net.dt * 1e-3)
print(f'jitc_net[{law},capdiv={cap_div}] n={net.num}: '
      f'{best/steps*1e6:.2f} us/step  '
      f'(runs {[round(t/steps*1e6, 2) for t in times]}, {steps} steps, '
      f'{spikes:.0f} spikes = {rate:.1f} Hz, compile+run1 {tc:.0f}s)',
      flush=True)
