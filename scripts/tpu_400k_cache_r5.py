# Round-5: persistent compilation cache on the 400k mega-kernel.
# Run TWICE (fresh process each); report compile time both times.
# PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_400k_cache_r5.py
import time
import sys

import brainevent_tpu as be
be.config.set_compilation_cache('/tmp/be_xc_400k')

import jax
import jax.monitoring
from jax.random import PRNGKey

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim, mxu6_conn_table

hits = []
jax.monitoring.register_event_listener(
    lambda event, **kw: hits.append(event) if 'cache_hit' in event else None)

print('devices:', jax.devices(), flush=True)
n_steps = 5_000
net = EINet(scale=100.0, seed=42)
tb = mxu6_conn_table(net)
states = [net.init_state(PRNGKey(k)) for k in range(4)]
tfn = jax.jit(lambda s, t: einet_pallas_sim(net, s, n_steps, 20.0, conn_table=t))
t0 = time.perf_counter()
out = jax.block_until_ready(tfn(states[0], tb))
print(f'[400064] compiled+warm in {time.perf_counter()-t0:.1f}s  '
      f'cache_hits={len(hits)}', flush=True)
times = []
for st in states[1:]:
    t0 = time.perf_counter()
    out = jax.block_until_ready(tfn(st, tb))
    times.append(time.perf_counter() - t0)
med = sorted(times)[1]
rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
print(f'[400064] auto(mxu6): {med/n_steps*1e6:.2f} us/step '
      f'(times {[f"{t/n_steps*1e6:.2f}" for t in times]}) rate={rate:.1f}Hz '
      f'spikes={int(out[4].sum())}', flush=True)
