# XLA step-loop path at 200k/400k: the non-mega-kernel baseline, plus
# mxu_scatter_limit A/B at these sizes.
import time
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu import config
from brainevent_tpu.models.networks import EINet

print('devices:', jax.devices(), flush=True)
for scale, n_steps in ((50.0, 10_000), (100.0, 5_000)):
    net = EINet(scale=scale, seed=42)
    states = [net.init_state(jax.random.PRNGKey(k)) for k in range(3)]
    for limit_name, limit in (('xla-scatter', 0), ('mxu-onehot', 1 << 30)):
        config.set_mxu_scatter_limit(limit)
        try:
            tfn = jax.jit(lambda s, net=net, n=n_steps: net.run(n, 20.0, s))
            t0 = time.perf_counter()
            out = jax.block_until_ready(tfn(states[0]))
            print(f'[{net.num}] {limit_name}: compiled+ran in '
                  f'{time.perf_counter()-t0:.0f}s', flush=True)
            times = []
            for st in states[1:]:
                t0 = time.perf_counter()
                out = jax.block_until_ready(tfn(st))
                times.append(time.perf_counter() - t0)
            med = min(times)
            rate = float(out.spike_count.mean()) / (n_steps * net.dt * 1e-3)
            print(f'[{net.num}] {limit_name}: {med / n_steps * 1e6:.2f} '
                  f'us/step rate={rate:.1f}Hz', flush=True)
        except Exception as e:
            print(f'[{net.num}] {limit_name}: FAILED {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)
