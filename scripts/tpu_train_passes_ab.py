# A/B the plan bf16-split depth knobs on the 10M-synapse train step
# (fwd_passes / bwd_passes; control = 3/3 exact, measured 28.2
# ms/sim-step in round 3). Same protocol as tpu_training_bench.py:
# consts as jit args, params fed back, forced scalar reads.
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.models.training import SurrogateSNN, train_step

print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.random((50, 100)).astype(np.float32))

for fp, bp in ((3, 3), (2, 3), (2, 2)):
    model = SurrogateSNN(n_in=100, n_hidden=100_000, n_out=10, n_conn=100,
                         seed=2, fwd_passes=fp, bwd_passes=bp)
    p = model.init_params()
    c = model.consts()
    step = jax.jit(lambda pp, cc: train_step(model, pp, xb, jnp.asarray(3),
                                             lr=1e-3, consts=cc))
    t0 = time.perf_counter()
    p, loss = step(p, c)
    l_first = float(loss)
    print(f'fwd_passes={fp} bwd_passes={bp}: compile+run1 '
          f'{time.perf_counter()-t0:.1f}s loss={l_first:.6f}', flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        p, loss = step(p, c)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[2]
    print(f'fwd_passes={fp} bwd_passes={bp}: {med*1e3:.1f} ms/train-step '
          f'({med/50*1e6:.1f} us/sim-step fwd+bwd)', flush=True)
print('PASSES AB DONE', flush=True)
