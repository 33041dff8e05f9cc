# 400k timing only (exactness already proven); ONE compile reused.
import time
import jax
from jax.random import PRNGKey
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

print('devices:', jax.devices(), flush=True)
n_steps = 5_000
net = EINet(scale=100.0, seed=42)
states = [net.init_state(PRNGKey(k)) for k in range(4)]
tfn = jax.jit(lambda s: einet_pallas_sim_mxu3(net, s, n_steps, 20.0))
t0 = time.perf_counter()
out = jax.block_until_ready(tfn(states[0]))
print(f'[400064] compiled+warm in {time.perf_counter()-t0:.0f}s', flush=True)
times = []
for st in states[1:]:
    t0 = time.perf_counter()
    out = jax.block_until_ready(tfn(st))
    times.append(time.perf_counter() - t0)
med = sorted(times)[1]
rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
print(f'[400064] mxu3: {med / n_steps * 1e6:.2f} us/step '
      f'(times {[f"{t/n_steps*1e6:.2f}" for t in times]}) rate={rate:.1f}Hz',
      flush=True)
