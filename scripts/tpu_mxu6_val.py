# mxu6 (partitioned-table scatter) hardware validation: runtime + compile
# at scale vs mxu3. Fresh process per config; warm on state A, 3 timed
# runs on DISTINCT states, value read inside the clock.
import sys
import time
import jax
import jax.numpy as jnp

from brainevent_tpu.models.networks import EINet
from brainevent_tpu.models.pallas_sim import (einet_pallas_sim_mxu6,
                                              mxu6_conn_table)

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
rpb = int(sys.argv[3]) if len(sys.argv) > 3 else 192
group = int(sys.argv[4]) if len(sys.argv) > 4 else 4
unroll = int(sys.argv[5]) if len(sys.argv) > 5 else 1
gather = sys.argv[6] if len(sys.argv) > 6 else 'rows'
prefetch = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False
fused = int(sys.argv[8]) if len(sys.argv) > 8 else 0   # 0/1/2 (2 = wide)
ei = bool(int(sys.argv[9])) if len(sys.argv) > 9 else True
bpk = int(sys.argv[10]) if len(sys.argv) > 10 else 1
m1f = bool(int(sys.argv[11])) if len(sys.argv) > 11 else False
cj = int(sys.argv[12]) if len(sys.argv) > 12 else 4
tw = int(sys.argv[13]) if len(sys.argv) > 13 else 0
cd = (None if len(sys.argv) <= 14 or sys.argv[14] == 'auto'
      else bool(int(sys.argv[14])))
radix = int(sys.argv[15]) if len(sys.argv) > 15 else 3

print('devices:', jax.devices(), flush=True)

net = EINet(scale=scale, coba=True, seed=42)
s0 = net.init_state(jax.random.PRNGKey(0))
n = net.num

# table as a jit ARGUMENT: embedded it is ~600 MB of program constants at
# 400k and the remote-compile relay rejects the request (HTTP 413)
tb = mxu6_conn_table(net, rpb=rpb, group=group, gather=gather,
                     radix=radix)
f = jax.jit(lambda st, tb: einet_pallas_sim_mxu6(net, st, steps,
                                                 rpb=rpb, group=group,
                                                 factor_unroll=unroll,
                                                 gather=gather,
                                                 prefetch=prefetch,
                                                 fused_load=fused,
                                                 ei_split=ei,
                                                 block_pack=bpk,
                                                 m1_fuse=m1f,
                                                 compact_j=cj,
                                                 compact_dot=cd,
                                                 tier_w=tw, radix=radix,
                                                 conn_table=tb))
t0 = time.perf_counter()
out = f(s0, tb)
warm_spikes = float(jnp.sum(out[4]))
tc = time.perf_counter() - t0
tag = (f'mxu6[rpb={rpb},g={group},u={unroll},{gather},pf={prefetch:d},'
       f'fl={fused:d},ei={ei:d},bp={bpk},m1f={m1f:d},cj={cj},tw={tw},'
       f'cd={cd},rx={radix}]')
print(f'{tag} n={n}: compile+run1 {tc:.0f}s '
      f'({warm_spikes:.0f} spikes)', flush=True)

times = []
for i in range(3):
    si = s0._replace(g_e=s0.g_e + 1e-6 * (i + 1))
    t0 = time.perf_counter()
    out = f(si, tb)
    spikes = float(jnp.sum(out[4]))
    times.append(time.perf_counter() - t0)
    print(f'  run{i}: {times[-1]/steps*1e6:.2f} us/step '
          f'({spikes:.0f} spikes)', flush=True)

med = sorted(times)[1]
print(f'{tag} n={n}: median {med/steps*1e6:.2f} us/step '
      f'({steps} steps)', flush=True)
