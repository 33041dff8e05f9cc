# TPU validation of mega-kernel v10 at the benchmark size (COBA 4k).
#
# With live recurrence the network is chaotic: kernel and XLA loop differ in
# f32 summation ORDER (MXU tree reduction vs scatter-add), so single-ULP
# differences amplify over hundreds of steps. Validation is therefore
# two-tier: exact agreement over a short horizon (before divergence can
# amplify) + statistical agreement (total spikes within 2%) over a long one.
import time

import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim

print('devices:', jax.devices())
net = EINet(scale=1.0, seed=42)   # 4000 neurons (benchmark config)
state = net.init_state(jax.random.PRNGKey(7))

# -- tier 1: exact over 60 steps ----------------------------------------------
k60 = jax.jit(lambda s: einet_pallas_sim(net, s, 60, 20.0))
v, tl, ge, gi, cnt = jax.block_until_ready(k60(state))
ref = jax.block_until_ready(jax.jit(lambda s: net.run(60, 20.0, s))(state))
print('60-step spikes kernel/loop:', int(cnt.sum()), int(ref.spike_count.sum()))
np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref.spike_count))
np.testing.assert_allclose(np.asarray(v), np.asarray(ref.neurons.v),
                           rtol=1e-4, atol=1e-4)
print('tier-1 exact OK')

# -- tier 2: statistical over 2000 steps --------------------------------------
k2k = jax.jit(lambda s: einet_pallas_sim(net, s, 2000, 20.0))
out = jax.block_until_ready(k2k(state))
ref = jax.block_until_ready(jax.jit(lambda s: net.run(2000, 20.0, s))(state))
sk, sl = int(out[4].sum()), int(ref.spike_count.sum())
print('2000-step spikes kernel/loop: %d / %d (%.2f%% diff)'
      % (sk, sl, 100 * abs(sk - sl) / max(sl, 1)))
assert abs(sk - sl) / max(sl, 1) < 0.02, 'statistical divergence too large'
print('tier-2 statistical OK; rate %.1f Hz'
      % (float(out[4].mean()) / (2000 * net.dt * 1e-3)))

# -- timing: 100k steps --------------------------------------------------------
N = 100_000
tfn = jax.jit(lambda s: einet_pallas_sim(net, s, N, 20.0))
out = jax.block_until_ready(tfn(state))  # compile + first run
t0 = time.perf_counter()
out = jax.block_until_ready(tfn(state))
el = time.perf_counter() - t0
print('v10 mega-kernel: %.2f s for %dk steps = %.2f us/step' %
      (el, N // 1000, el / N * 1e6))
print('total spikes:', int(out[4].sum()),
      'rate %.1f Hz' % (float(out[4].mean()) / (N * net.dt * 1e-3)))
