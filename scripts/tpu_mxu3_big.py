# 200k/400k after the chunked-offsets fix.
import time
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3

print('devices:', jax.devices(), flush=True)
CASES = [
    (50.0, 10_000, 'bf16concat', dict(mask_dtype=jnp.bfloat16, operands='concat')),
    (50.0, 10_000, 'bf16concat-hbm', dict(mask_dtype=jnp.bfloat16, operands='concat', table_space='hbm')),
    (100.0, 5_000, 'bf16concat-hbm', dict(mask_dtype=jnp.bfloat16, operands='concat', table_space='hbm')),
]
nets = {}
for scale, n_steps, name, kw in CASES:
    if scale not in nets:
        net = EINet(scale=scale, seed=42)
        state = net.init_state(jax.random.PRNGKey(7))
        ref = jax.block_until_ready(
            jax.jit(lambda s, net=net: net.run(60, 20.0, s))(state))
        nets[scale] = (net, state, ref)
    net, state, ref = nets[scale]
    try:
        k60 = jax.jit(lambda s, net=net, kw=kw:
                      einet_pallas_sim_mxu3(net, s, 60, 20.0, **kw))
        out = jax.block_until_ready(k60(state))
        ok = np.array_equal(np.asarray(out[4]), np.asarray(ref.spike_count))
        print(f'[{net.num}] {name} exact={ok}', flush=True)
        if not ok:
            continue
        tfn = jax.jit(lambda s, net=net, n=n_steps, kw=kw:
                      einet_pallas_sim_mxu3(net, s, n, 20.0, **kw))
        out = jax.block_until_ready(tfn(state))
        t0 = time.perf_counter()
        out = jax.block_until_ready(tfn(state))
        el = time.perf_counter() - t0
        rate = float(out[4].mean()) / (n_steps * net.dt * 1e-3)
        print(f'[{net.num}] {name}: {el / n_steps * 1e6:.2f} us/step rate={rate:.1f}Hz', flush=True)
    except Exception as e:
        print(f'[{net.num}] {name}: FAILED {type(e).__name__}: {str(e)[:300]}', flush=True)
