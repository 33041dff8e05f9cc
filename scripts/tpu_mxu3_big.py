# 200k/400k: exactness vs the XLA loop (60 steps) + timed runs with
# distinct initial states (the relay caches identical execute calls).
import time
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

print('devices:', jax.devices(), flush=True)
CASES = [(50.0, 10_000), (100.0, 5_000)]
for scale, n_steps in CASES:
    net = EINet(scale=scale, seed=42)
    states = [net.init_state(jax.random.PRNGKey(k)) for k in range(4)]
    try:
        ref = jax.block_until_ready(
            jax.jit(lambda s, net=net: net.run(60, 20.0, s))(states[0]))
        t0 = time.perf_counter()
        k60 = jax.jit(lambda s, net=net:
                      einet_pallas_sim_mxu3(net, s, 60, 20.0))
        out = jax.block_until_ready(k60(states[0]))
        ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
        print(f'[{net.num}] compiled {time.perf_counter()-t0:.0f}s '
              f'exact={ok}', flush=True)
        if not ok:
            continue
        tfn = jax.jit(lambda s, net=net, n=n_steps:
                      einet_pallas_sim_mxu3(net, s, n, 20.0))
        jax.block_until_ready(tfn(states[0]))
        times = []
        for st in states[1:]:
            t0 = time.perf_counter()
            out = jax.block_until_ready(tfn(st))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
        print(f'[{net.num}] mxu3: {med / n_steps * 1e6:.2f} us/step '
              f'(times {[f"{t/n_steps*1e6:.2f}" for t in times]}) '
              f'rate={rate:.1f}Hz', flush=True)
    except Exception as e:
        print(f'[{net.num}] FAILED {type(e).__name__}: {str(e)[:400]}',
              flush=True)
