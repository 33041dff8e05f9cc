# mxu2 (vectorized compaction) hardware timing at 4k and 40k.
import time
import jax
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim

print('devices:', jax.devices())
for scale, n_steps in ((1.0, 100_000), (10.0, 20_000)):
    net = EINet(scale=scale, seed=42)
    state = net.init_state(jax.random.PRNGKey(7))
    ref = jax.block_until_ready(
        jax.jit(lambda s, net=net: net.run(60, 20.0, s))(state))
    k60 = jax.jit(lambda s, net=net:
                  einet_pallas_sim(net, s, 60, 20.0, strategy='mxu2'))
    out = jax.block_until_ready(k60(state))
    ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
    print(f'[{net.num}] mxu2 60-step exact={ok}')
    assert ok
    tfn = jax.jit(lambda s, net=net, n=n_steps:
                  einet_pallas_sim(net, s, n, 20.0, strategy='mxu2'))
    out = jax.block_until_ready(tfn(state))
    t0 = time.perf_counter()
    out = jax.block_until_ready(tfn(state))
    el = time.perf_counter() - t0
    rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
    print(f'[{net.num}] mxu2: {el / n_steps * 1e6:.2f} us/step '
          f'({el:.2f} s / {n_steps}), rate {rate:.1f} Hz')
