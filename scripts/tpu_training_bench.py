# Acceptance workloads on the real chip (BASELINE.md):
# 1. surrogate-gradient training step, 100k hidden neurons x 100 conn
#    (10M synapses) — train-step wall time + a short loss-descent run.
# 2. 10M-synapse event FCN product microbench (fused loop).
import time
import jax
import jax.numpy as jnp
import numpy as np

from brainevent_tpu.models.training import SurrogateSNN, train_step, snn_loss
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.fcn.binary import binary_fcnmv_p_call

print('devices:', jax.devices(), flush=True)

# ---- 1. training: small net loss target (correctness), big net timing ----
model_s = SurrogateSNN(n_in=40, n_hidden=2000, n_out=4, n_conn=32, seed=1)
params = model_s.init_params()
rng = np.random.default_rng(0)
# class-templated inputs (class c drives input block [10c, 10c+10)):
# separable by construction so the loss target tests learning
Xn = 0.2 * rng.random((4, 50, 40)).astype(np.float32)
for c in range(4):
    Xn[c, :, 10 * c:10 * c + 10] += 1.0
X = jnp.asarray(Xn)
Y = jnp.asarray([0, 1, 2, 3])

@jax.jit
def epoch(params):
    def one(p, xy):
        x, y = xy
        return train_step(model_s, p, x, y, lr=0.5)
    return jax.lax.scan(one, params, (X, Y))

l0 = float(jnp.mean(jax.vmap(lambda x, y: snn_loss(model_s, params, x, y))(X, Y)))
for ep in range(30):
    params, losses = epoch(params)
l1 = float(jnp.mean(jax.vmap(lambda x, y: snn_loss(model_s, params, x, y))(X, Y)))
print(f'train: loss {l0:.3f} -> {l1:.3f} after 30 epochs '
      f'(target < 0.2: {"PASS" if l1 < 0.2 else "FAIL"})', flush=True)

# big-net train-step timing: 100k hidden, 100 conn = 10M synapses, T=50.
# consts MUST be jit arguments at this scale: as closure constants the
# plan metadata (~200 MB) lands in the compile request (HTTP 413 on the
# relay's remote-compile endpoint).
model_b = SurrogateSNN(n_in=100, n_hidden=100_000, n_out=10, n_conn=100,
                       seed=2)
pb = model_b.init_params()
cb = model_b.consts()
xb = jnp.asarray(rng.random((50, 100)).astype(np.float32))
step = jax.jit(lambda p, c: train_step(model_b, p, xb, jnp.asarray(3),
                                       lr=1e-3, consts=c))
t0 = time.perf_counter()
pb2, loss = step(pb, cb)
_ = float(loss)
print(f'100k-neuron train step compiled+ran in {time.perf_counter()-t0:.1f}s',
      flush=True)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    pb, loss = step(pb, cb)  # params feed back -> no relay execute-cache
    _ = float(loss)       # forced scalar read: block_until_ready is not
    times.append(time.perf_counter() - t0)  # reliable through the relay
med = sorted(times)[2]
print(f'100k-neuron (10M-synapse) surrogate train step: {med*1e3:.1f} ms '
      f'(T=50 unrolled steps; {med/50*1e6:.1f} us per sim-step fwd+bwd)',
      flush=True)

# ---- 2. 10M-synapse event FCN product (fused-loop microbench) ----
n, K = 100_000, 100
indices = jnp.asarray(rng.integers(0, n, (n, K)), dtype=jnp.int32)
w = jnp.asarray([0.5], jnp.float32)
for rate in (0.001, 0.01):
    s = jnp.asarray(rng.random(n) < rate)
    for transpose in (True, False):
        res = benchmark_function(
            lambda *a, **kw: binary_fcnmv_p_call(*a, **kw)[0],
            w, indices, s, shape=(n, n), transpose=transpose,
            name=f'binary_fcnmv[10M,rate={rate},'
                 f'{"T" if transpose else "NT"}]',
            n_warmup=1, n_runs=5, verbose=True, iterations=200, loop_arg=2)
