# JITCNet r4 anatomy (VERDICT r3 item 5): where do the 2.0 ms/step at 80k
# go, and does dropping the per-row sort at windowed-scatter sizes help?
import sys, time
import jax, jax.numpy as jnp, numpy as np
from brainevent_tpu.models.jitc_net import JITCNet
from brainevent_tpu.ops.benchmark import benchmark_function

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
variant = sys.argv[3] if len(sys.argv) > 3 else 'base'

cd = int(sys.argv[4]) if len(sys.argv) > 4 else 128
net = JITCNet(scale=scale, weight_law='normal', coba=True, seed=1,
              cap_divisor=cd)
if variant == 'norowsort':
    net.plan_e.row_cap = None
    net.plan_i.row_cap = None
print(f'n={net.num} variant={variant} rounds_e={net.plan_e.scan_rounds} '
      f'cap_e={net.plan_e.event_cap} row_cap_e={net.plan_e.row_cap}',
      flush=True)
run = jax.jit(lambda s: net.run(steps, state=s))
s0 = net.init_state()
t0 = time.perf_counter()
out = jax.block_until_ready(run(s0))
print(f'compile+run1 {time.perf_counter()-t0:.0f}s '
      f'spikes={int(np.asarray(out.spike_count).sum())}', flush=True)
times = []
for i in range(3):
    si = s0._replace(g_e=s0.g_e + 1e-6 * (i + 1))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(si))
    times.append(time.perf_counter() - t0)
med = sorted(times)[1]
print(f'JITCNet n={net.num} {variant}: {med/steps*1e6:.1f} us/step '
      f'spikes={int(np.asarray(out.spike_count).sum())}', flush=True)

if variant == 'micro':
    # component micro-times at this scale
    n_exc = net.n_exc
    cap = net.plan_e.event_cap
    spk = jnp.asarray(np.random.default_rng(0).random(n_exc) < 0.005)
    benchmark_function(
        lambda s: jnp.nonzero(s, size=cap, fill_value=n_exc)[0], spk,
        name=f'nonzero_{n_exc}', iterations=500, loop_arg=0,
        n_runs=3, n_warmup=2)
    from brainevent_tpu.events.compact_ops import binary_1d_array_index_p_call
    benchmark_function(
        lambda s: binary_1d_array_index_p_call(s)[0], spk,
        name=f'encoder_1d_{n_exc}', iterations=500, loop_arg=0,
        n_runs=3, n_warmup=2)
    state2 = net.plan_e.setup[0]
    ids = jnp.asarray(np.random.default_rng(1).integers(0, n_exc, cap), jnp.int32)
    benchmark_function(
        lambda i_: state2[i_], ids,
        name=f'stream_row_gather_{cap}x{state2.shape[1]}', iterations=500,
        loop_arg=0, n_runs=3, n_warmup=2)
