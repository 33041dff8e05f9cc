# Re-verify the mega-kernel scaling numbers with READ-FORCED timing
# (block_until_ready is unreliable on this relay — BENCH_NOTES.md).
import time
import jax
from jax.random import PRNGKey
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

print('devices:', jax.devices(), flush=True)
for scale, n_steps in ((1.0, 100_000), (10.0, 20_000)):
    net = EINet(scale=scale, seed=42)
    states = [net.init_state(PRNGKey(k)) for k in range(4)]
    tfn = jax.jit(lambda s, net=net, n=n_steps:
                  einet_pallas_sim_mxu3(net, s, n, 20.0))
    out = tfn(states[0])
    float(out[4].sum())                       # compile+warm, read-forced
    times = []
    for st in states[1:]:
        t0 = time.perf_counter()
        out = tfn(st)
        float(out[4].sum())                   # read INSIDE the clock
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
    print(f'[{net.num}] mxu3 read-forced: {med / n_steps * 1e6:.2f} us/step '
          f'(times {[f"{t/n_steps*1e6:.2f}" for t in times]}) '
          f'rate={rate:.1f}Hz', flush=True)
