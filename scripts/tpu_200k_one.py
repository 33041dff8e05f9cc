# Single-case 200k compile attempt with the FULL error body.
import sys
import time
import traceback
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import (
    einet_pallas_sim_mxu2, einet_pallas_sim_mxu3)

which = sys.argv[1] if len(sys.argv) > 1 else 'mxu3'
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0
print('devices:', jax.devices(), 'case:', which, scale, flush=True)
net = EINet(scale=scale, seed=42)
state = net.init_state(jax.random.PRNGKey(7))
try:
    if which == 'mxu2':
        fn = jax.jit(lambda s: einet_pallas_sim_mxu2(net, s, 60, 20.0))
    elif which == 'mxu3hbm':
        fn = jax.jit(lambda s: einet_pallas_sim_mxu3(
            net, s, 60, 20.0, table_space='hbm'))
    else:
        fn = jax.jit(lambda s: einet_pallas_sim_mxu3(net, s, 60, 20.0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(state))
    print(f'[{net.num}] {which}: OK in {time.perf_counter()-t0:.1f}s, '
          f'spikes={int(out[4].sum())}', flush=True)
except Exception:
    print(f'[{net.num}] {which}: FAILED', flush=True)
    traceback.print_exc()
