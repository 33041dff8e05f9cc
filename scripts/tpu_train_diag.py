# Component-level timing of the 100k/10M surrogate train step:
# which piece of fwd/bwd costs the 141 ms/sim-step?
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.models.training import SurrogateSNN, snn_loss

print('devices:', jax.devices(), flush=True)

model = SurrogateSNN(n_in=100, n_hidden=100_000, n_out=10, n_conn=100, seed=2)
params = model.init_params()
rng = np.random.default_rng(0)
T = 10  # short scan: per-sim-step numbers scale linearly
x = jnp.asarray(rng.random((T, 100)).astype(np.float32))
label = jnp.asarray(3)


def timeit(name, f, *args, n=3):
    out = f(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {min(ts)*1e3:.1f} ms', flush=True)
    return min(ts)


# 1. forward only (T sim-steps)
fwd = jax.jit(lambda p: model.run(p, x))
t_fwd = timeit(f'forward run T={T}', fwd, params)
print(f'  -> {t_fwd/T*1e3:.2f} ms/sim-step fwd', flush=True)

# 2. full value_and_grad
vg = jax.jit(lambda p: jax.value_and_grad(
    lambda q: snn_loss(model, q, x, label))(p))
t_vg = timeit(f'value_and_grad T={T}', vg, params)
print(f'  -> {t_vg/T*1e3:.2f} ms/sim-step fwd+bwd', flush=True)

# 3. plan_matvec alone (the dspk path), model's own plan
from brainevent_tpu.ops.mxu_gather import plan_matvec
plan = model._plan
w_sorted = plan.sort_data(params.w_rec)
ct = jnp.asarray(rng.random(100_000).astype(np.float32))
pm = jax.jit(lambda w, c: plan_matvec(plan, w, c))
timeit('plan_matvec (default plan params)', pm, w_sorted, ct)

# 4. _event_dw alone at biological-ish activity
spk = jnp.asarray((rng.random(100_000) < 0.01).astype(np.float32))
dw = jax.jit(lambda s, c: model._event_dw(s, c))
timeit('_event_dw (1% active, cap path)', dw, spk, ct)
spk0 = jnp.zeros(100_000)
timeit('_event_dw (0 active)', dw, spk0, ct)

# 5. event forward alone
ef = jax.jit(lambda w, s: model._event_forward(w, s))
timeit('_event_forward (1% active)', ef, params.w_rec, spk)

# 6. w_sorted permutation (hoisted, once per train step)
sd = jax.jit(plan.sort_data)
timeit('plan.sort_data (once/train-step)', sd, params.w_rec)
