# mxu4: compile-time + runtime scaling; exactness vs the XLA loop at each
# size (60 steps), timing with distinct initial states.
import sys
import time
import jax
from jax.random import PRNGKey
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu4

print('devices:', jax.devices(), flush=True)
CASES = [(10.0, 20_000), (25.0, 20_000), (50.0, 10_000), (100.0, 5_000)]
if len(sys.argv) > 1:
    CASES = [c for c in CASES if c[0] in [float(x) for x in sys.argv[1:]]]
for scale, n_steps in CASES:
    net = EINet(scale=scale, seed=42)
    states = [net.init_state(PRNGKey(k)) for k in range(4)]
    try:
        ref = jax.block_until_ready(
            jax.jit(lambda s, net=net: net.run(60, 20.0, s))(states[0]))
        t0 = time.perf_counter()
        k60 = jax.jit(lambda s, net=net:
                      einet_pallas_sim_mxu4(net, s, 60, 20.0))
        out = jax.block_until_ready(k60(states[0]))
        ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
        print(f'[{net.num}] mxu4 compiled {time.perf_counter()-t0:.0f}s '
              f'exact={ok}', flush=True)
        if not ok:
            continue
        tfn = jax.jit(lambda s, net=net, n=n_steps:
                      einet_pallas_sim_mxu4(net, s, n, 20.0))
        t0 = time.perf_counter()
        jax.block_until_ready(tfn(states[0]))
        print(f'[{net.num}] timed-fn compiled+warm {time.perf_counter()-t0:.0f}s',
              flush=True)
        times = []
        for st in states[1:]:
            t0 = time.perf_counter()
            out = jax.block_until_ready(tfn(st))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
        print(f'[{net.num}] mxu4: {med / n_steps * 1e6:.2f} us/step '
              f'(times {[f"{t/n_steps*1e6:.2f}" for t in times]}) '
              f'rate={rate:.1f}Hz', flush=True)
    except Exception as e:
        print(f'[{net.num}] FAILED {type(e).__name__}: {str(e)[:300]}',
              flush=True)
