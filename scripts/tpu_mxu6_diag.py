# mxu6 phase decomposition at scale: time the kernel with phases ablated.
#
# Ablating a phase corrupts the synaptic increments, which would FEED BACK
# into the spike dynamics and change the event counts (first attempt: the
# '-gather' config read garbage rows, conductances exploded, every step
# overflowed into extra rounds and timed SLOWER than full). The fix:
# w_e = w_i = 1e-30 makes every config integrate the same input-driven
# dynamics (increment contributions underflow to ~0 against mV-scale
# voltages) while all phases still process the TRUE event stream — the
# deltas between configs are then attributable to the ablated phase alone.
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
fused = int(sys.argv[8]) if len(sys.argv) > 8 else 0
ei = bool(int(sys.argv[9])) if len(sys.argv) > 9 else True
radix = (int(sys.argv[10]) if len(sys.argv) > 10 and sys.argv[10] != 'auto'
         else 'auto')

print('devices:', jax.devices(), flush=True)
net = EINet(scale=scale, coba=True, seed=42, w_e=1e-30, w_i=1e-30)
s0 = net.init_state(jax.random.PRNGKey(0))
tb = mxu6_conn_table(net, rpb=rpb, group=group, gather=gather,
                     radix=radix)

CONFIGS = [
    ('full', ()),
    ('-factor', ('factor',)),
    ('-gather', ('gather',)),
    ('-gather-factor', ('gather', 'factor')),
    ('-gather-factor-transpose', ('gather', 'factor', 'transpose')),
    ('-all-scatter', ('gather', 'factor', 'transpose', 'compact')),
]

for name, ab in CONFIGS:
    f = jax.jit(lambda st, tb, ab=ab: einet_pallas_sim_mxu6(
        net, st, steps, rpb=rpb, group=group, factor_unroll=unroll,
        gather=gather, prefetch=prefetch, fused_load=fused,
        ei_split=ei, radix=radix,
        conn_table=tb, _ablate=ab))
    t0 = time.perf_counter()
    out = f(s0, tb)
    spk = float(jnp.sum(out[4]))
    tc = time.perf_counter() - t0
    times = []
    for i in range(3):
        si = s0._replace(g_e=s0.g_e + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        out = f(si, tb)
        float(jnp.sum(out[4]))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    print(f'[g={group},u={unroll},{gather},pf={prefetch:d},fl={fused:d},ei={ei:d}] {name:24s}: {med/steps*1e6:8.2f} us/step  '
          f'({spk:.0f} spikes, compile+run1 {tc:.0f}s)', flush=True)
