# mxu3 vs mxu2 hardware timing at 4k / 40k / 100k.
import time
import jax
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim

print('devices:', jax.devices(), flush=True)
for scale, n_steps, strats in ((1.0, 100_000, ('mxu3', 'mxu2')),
                               (10.0, 20_000, ('mxu3', 'mxu2')),
                               (25.0, 20_000, ('mxu3',))):
    net = EINet(scale=scale, seed=42)
    state = net.init_state(jax.random.PRNGKey(7))
    ref = jax.block_until_ready(
        jax.jit(lambda s, net=net: net.run(60, 20.0, s))(state))
    for strat in strats:
        k60 = jax.jit(lambda s, net=net, st=strat:
                      einet_pallas_sim(net, s, 60, 20.0, strategy=st))
        out = jax.block_until_ready(k60(state))
        ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
        print(f'[{net.num}] {strat} 60-step exact={ok}', flush=True)
        assert ok, f'{strat} inexact at {net.num}'
        tfn = jax.jit(lambda s, net=net, n=n_steps, st=strat:
                      einet_pallas_sim(net, s, n, 20.0, strategy=st))
        out = jax.block_until_ready(tfn(state))
        t0 = time.perf_counter()
        out = jax.block_until_ready(tfn(state))
        el = time.perf_counter() - t0
        rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
        print(f'[{net.num}] {strat}: {el / n_steps * 1e6:.2f} us/step '
              f'({el:.2f} s / {n_steps}), rate {rate:.1f} Hz', flush=True)
