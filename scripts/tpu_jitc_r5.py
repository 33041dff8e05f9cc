# Round-5 VERDICT item 6: JITCNet 4k decisive runs + 80k scatter A/B.
#  - 4k: three fresh-state timings (bar: <= 95 us/step, median)
#  - 80k: A/B the sorted windowed scatter threshold on THIS exact shape
#    (the event tail scatters ~72k-slot outputs; r4 floor: scatter 284 +
#    row-sort 131 us). wso=0 forces windowed, wso=10**9 forces one-hot/
#    XLA, default 65536.
# PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_jitc_r5.py
import time

import brainevent_tpu as be
be.config.set_compilation_cache('')

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
from brainevent_tpu.models import JITCNet  # noqa: E402

print('devices:', jax.devices(), flush=True)


def run_cfg(scale, steps, wso=None, reps=3):
    if wso is not None:
        be.config.set_windowed_scatter_min_out(wso)
    net = JITCNet(scale=scale)
    f = jax.jit(lambda st: net.run(steps, state=st))
    t0 = time.perf_counter()
    out = f(net.init_state(jax.random.PRNGKey(0)))
    spikes = float(jnp.sum(out.spike_count))
    tc = time.perf_counter() - t0
    times = []
    for k in range(1, reps + 1):
        s = net.init_state(jax.random.PRNGKey(k))
        t0 = time.perf_counter()
        out = f(s)
        spikes = float(jnp.sum(out.spike_count))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f'scale={scale} wso={wso}: {med/steps*1e6:.1f} us/step '
          f'(all {[f"{t/steps*1e6:.1f}" for t in times]}; compile {tc:.0f}s) '
          f'spikes={int(spikes)}', flush=True)
    return med / steps * 1e6


# 80k scatter A/B first (the compile-heavy part)
for wso in (65536, 0, 10**9):
    run_cfg(20.0, 2000, wso=wso)
be.config.set_windowed_scatter_min_out(65536)

# 4k: three fresh runs at the default stack
for _ in range(3):
    run_cfg(1.0, 10000, reps=1)
