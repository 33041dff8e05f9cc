# Bisect the 200k compile failure: size x knob grid, full errors.
import time, traceback
import jax
import jax.numpy as jnp
import numpy as np
from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3, einet_pallas_sim_mxu2

print('devices:', jax.devices(), flush=True)
CASES = [
    (30.0, 'mxu3-default', dict()),
    (50.0, 'mxu3-f32concat', dict(mask_dtype=jnp.float32, operands='concat')),
    (50.0, 'mxu3-nopack', dict(mask_dtype=jnp.bfloat16, operands='concat', pack=False)),
    (50.0, 'mxu3-scratch', dict(mask_dtype=jnp.bfloat16, operands='scratch')),
    (50.0, 'mxu2', None),
]
for scale, name, kw in CASES:
    net = EINet(scale=scale, seed=42)
    state = net.init_state(jax.random.PRNGKey(7))
    try:
        if kw is None:
            fn = jax.jit(lambda s, net=net: einet_pallas_sim_mxu2(net, s, 60, 20.0))
        else:
            fn = jax.jit(lambda s, net=net, kw=kw: einet_pallas_sim_mxu3(net, s, 60, 20.0, **kw))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state))
        print(f'[{net.num}] {name}: COMPILED+RAN in {time.perf_counter()-t0:.1f}s, spikes={int(out[4].sum())}', flush=True)
    except Exception:
        tb = traceback.format_exc()
        print(f'[{net.num}] {name}: FAILED\n{tb[-2000:]}', flush=True)
