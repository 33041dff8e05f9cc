# Scaling table for BENCH_NOTES: mxu3 at 4k/16k/40k/100k with measured
# knobs (bf16 mask above 20k, f32 below; concat operands). Full-protocol
# step counts at small sizes, >=10k at large.
import sys
import time
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

print('devices:', jax.devices(), flush=True)
CASES = [
    (1.0, 100_000),
    (4.0, 50_000),
    (10.0, 50_000),
    (25.0, 20_000),
]
for scale, n_steps in CASES:
    net = EINet(scale=scale, seed=42)
    state = net.init_state(jax.random.PRNGKey(7))
    ref = jax.block_until_ready(
        jax.jit(lambda s, net=net: net.run(60, 20.0, s))(state))
    try:
        t0 = time.perf_counter()
        k60 = jax.jit(lambda s, net=net: einet_pallas_sim_mxu3(net, s, 60, 20.0))
        out = jax.block_until_ready(k60(state))
        ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
        print(f'[{net.num}] compiled {time.perf_counter()-t0:.0f}s exact={ok}',
              flush=True)
        if not ok:
            continue
        tfn = jax.jit(lambda s, net=net, n=n_steps:
                      einet_pallas_sim_mxu3(net, s, n, 20.0))
        out = jax.block_until_ready(tfn(state))
        t0 = time.perf_counter()
        out = jax.block_until_ready(tfn(state))
        el = time.perf_counter() - t0
        rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
        print(f'[{net.num}] mxu3: {el / n_steps * 1e6:.2f} us/step '
              f'rate={rate:.1f}Hz ({n_steps} steps)', flush=True)
    except Exception as e:
        print(f'[{net.num}] FAILED {type(e).__name__}: {str(e)[:300]}',
              flush=True)
