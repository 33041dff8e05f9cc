# mxu2 long-horizon exactness at 4k + official-protocol timing.
import time
import jax
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim

net = EINet(scale=1.0, seed=42)
state = net.init_state(jax.random.PRNGKey(7))
ref = jax.block_until_ready(jax.jit(lambda s: net.run(2000, 20.0, s))(state))
out = jax.block_until_ready(jax.jit(
    lambda s: einet_pallas_sim(net, s, 2000, 20.0))(state))
sk, sl = int(out[4].sum()), int(ref.spike_count.sum())
print(f'mxu2 2000-step spikes {sk}/{sl} ({100*abs(sk-sl)/sl:.2f}% diff)')
