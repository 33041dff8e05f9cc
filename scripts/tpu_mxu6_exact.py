# mxu6 exactness on hardware vs the mxu3 oracle at 4k (same net/state,
# spike-count equality over many steps; value reads force completion).
import time
import jax
import jax.numpy as jnp

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import (einet_pallas_sim_mxu3,
                                              einet_pallas_sim_mxu6,
                                              mxu6_conn_table)

print('devices:', jax.devices(), flush=True)
net = EINet(scale=1.0, coba=True, seed=42)
s0 = net.init_state(jax.random.PRNGKey(0))
steps = 2000

t0 = time.perf_counter()
ref = jax.jit(lambda st: einet_pallas_sim_mxu3(net, st, steps))(s0)
ref_cnt = jnp.asarray(ref[4])
print(f'mxu3 4k: {float(jnp.sum(ref_cnt)):.0f} spikes '
      f'({time.perf_counter()-t0:.0f}s)', flush=True)

tb = mxu6_conn_table(net)
t0 = time.perf_counter()
out = jax.jit(lambda st, tb: einet_pallas_sim_mxu6(net, st, steps,
                                                   conn_table=tb))(s0, tb)
cnt = jnp.asarray(out[4])
print(f'mxu6 4k: {float(jnp.sum(cnt)):.0f} spikes '
      f'({time.perf_counter()-t0:.0f}s)', flush=True)
exact = bool(jnp.array_equal(ref_cnt, cnt))
print(f'mxu6 4k exact vs mxu3: {exact}', flush=True)

# multi-partition exactness: rpb=384 at 4k gives P>1 with the real table
tb2 = mxu6_conn_table(net, rpb=6, group=4)
out2 = jax.jit(lambda st, tb: einet_pallas_sim_mxu6(
    net, st, steps, rpb=6, group=4, conn_table=tb))(s0, tb2)
exact2 = bool(jnp.array_equal(ref_cnt, jnp.asarray(out2[4])))
print(f'mxu6 4k rpb=6 (P={-(-((net.num+127)//128)//6)}) exact: {exact2}',
      flush=True)
