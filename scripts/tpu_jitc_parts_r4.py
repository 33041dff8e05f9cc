# Component anatomy of the 80k JITCNet step (VERDICT r3 item 5).
import jax, jax.numpy as jnp, numpy as np
from brainevent_tpu.models.jitc_net import JITCNet
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.ops.scatter import event_scatter_add
from brainevent_tpu.rng.light import light_rng_bounded, light_rng_next

net = JITCNet(scale=20.0, weight_law='normal', coba=True, seed=1)
plan = net.plan_e
state2, q2, cl = plan.setup
L = state2.shape[1]
cap = plan.event_cap
rounds = plan.scan_rounds
row_cap = plan.row_cap
n_exc = net.n_exc
out_len = net.num
print(f'n={net.num} L={L} cap={cap} rounds={rounds} row_cap={row_cap} '
      f'slots={rounds*L}', flush=True)
rng = np.random.default_rng(0)
spk = jnp.asarray(rng.random(n_exc) < 0.005)
ids = jnp.asarray(np.sort(rng.choice(n_exc, cap, replace=False)).astype(np.int32))

# a. stream row gather
benchmark_function(lambda i_: (state2[i_], q2[i_]), ids, name='a_row_gather',
                   iterations=300, loop_arg=0, n_runs=3, n_warmup=2)
# b. the fori walk (targets only)
U = jnp.uint32
clv = jnp.asarray(cl, U).reshape(())
def walk(st0, q0):
    st = st0.reshape(cap, -1, 32); q = q0.reshape(cap, -1, 32).astype(U)
    lanes3 = jax.lax.broadcasted_iota(U, st.shape, 2)
    def body(r, carry):
        st, q, acc = carry
        st = light_rng_next(st)
        q = q + U(1) + light_rng_bounded(st, clv - U(1))
        return st, q, acc + q.astype(jnp.int32).sum()
    st, q, acc = jax.lax.fori_loop(0, rounds, body, (st, q, jnp.int32(0)))
    return acc
st0, q0 = state2[ids], q2[ids]
benchmark_function(walk, st0, q0, name='b_walk', iterations=300, loop_arg=0,
                   n_runs=3, n_warmup=2)
# c. the per-row sort of the candidate buffer
tgt2 = jnp.asarray(rng.integers(0, out_len + 1, (cap, rounds * L)), jnp.int32)
benchmark_function(lambda t: jax.lax.sort(t, dimension=1), tgt2,
                   name='c_row_sort', iterations=100, loop_arg=0, n_runs=3,
                   n_warmup=2)
# d. scatter of the surviving candidates
tgt = jnp.asarray(rng.integers(0, out_len + 1, cap * row_cap), jnp.int32)
val = jnp.asarray(rng.random(cap * row_cap), jnp.float32)
benchmark_function(lambda v: event_scatter_add(tgt, v, out_len,
                                               dtype=jnp.float32), val,
                   name='d_scatter', iterations=300, loop_arg=0, n_runs=3,
                   n_warmup=2)
# e. compaction (encoder)
from brainevent_tpu.events.compact_ops import binary_1d_array_index_p_call
benchmark_function(lambda s: binary_1d_array_index_p_call(s)[0], spk,
                   name='e_encoder', iterations=300, loop_arg=0, n_runs=3,
                   n_warmup=2)
