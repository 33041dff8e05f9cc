# Dense-strategy hardware timing at 4k (+ exactness), vs BASELINE 26.6 us.
import time
import jax
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim

print('devices:', jax.devices())
net = EINet(scale=1.0, seed=42)
state = net.init_state(jax.random.PRNGKey(7))
ref = jax.block_until_ready(jax.jit(lambda s: net.run(60, 20.0, s))(state))
k60 = jax.jit(lambda s: einet_pallas_sim(net, s, 60, 20.0, strategy='dense'))
out = jax.block_until_ready(k60(state))
assert np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
print('[4000] dense: 60-step exact OK')

# longer exactness horizon
k2k = jax.jit(lambda s: einet_pallas_sim(net, s, 2000, 20.0, strategy='dense'))
ref2 = jax.block_until_ready(jax.jit(lambda s: net.run(2000, 20.0, s))(state))
out2 = jax.block_until_ready(k2k(state))
sk, sl = int(out2[4].sum()), int(ref2.spike_count.sum())
print(f'[4000] dense 2000-step spikes {sk}/{sl} ({100*abs(sk-sl)/sl:.2f}%)')

N = 100_000
tfn = jax.jit(lambda s: einet_pallas_sim(net, s, N, 20.0, strategy='dense'))
out = jax.block_until_ready(tfn(state))
t0 = time.perf_counter()
out = jax.block_until_ready(tfn(state))
el = time.perf_counter() - t0
rate = float(out[4].mean()) / (N * net.dt * 1e-3)
print(f'[4000] dense: {el/N*1e6:.2f} us/step ({el:.2f} s / {N}), '
      f'rate {rate:.1f} Hz')
