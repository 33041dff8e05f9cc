import numpy as np, jax, jax.numpy as jnp
from brainevent_tpu.ops.benchmark import benchmark_function
from brainevent_tpu.ops.mxu_gather import (build_gather_plan, gather_matvec,
    plan_inverse_perm, plan_matvec, plan_matvec_dw)

n, conn = 10000, 0.01
nse = int(n*n*conn)
rng = np.random.default_rng(0)
indices = np.asarray(rng.integers(0, n, nse), np.int32)
counts = np.full(n, nse//n); counts[:nse%n] += 1
indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
rows = np.repeat(np.arange(n), np.diff(indptr))
w = jnp.asarray(rng.normal(size=nse), jnp.float32)

plan = build_gather_plan(rows, indices, (n,n))
perm_np = np.asarray(plan.perm)       # (n_chunks, C)
n_slots = perm_np.size
valid = perm_np.reshape(-1) >= 0
slot_ids = np.arange(n_slots)[valid]
src = perm_np.reshape(-1)[valid]

# sort plan: out[slot] = data[src[slot]]
sort_plan = build_gather_plan(slot_ids, src, (n_slots, nse))
print('sort plan chunks:', sort_plan.n_chunks, 'pad ratio:', sort_plan.n_chunks*sort_plan.chunk/ max(1,len(src)))
ones = jnp.ones(len(src), jnp.float32)
ones_sorted = sort_plan.sort_data(ones)
ws_ref = plan.sort_data(w)
ws_mxu = gather_matvec(sort_plan, ones_sorted, w)[:n_slots]
print('sort exact:', bool(jnp.array_equal(ws_mxu.reshape(perm_np.shape), ws_ref)))

# unsort plan: out[e] = x[slot], slot = inv[e]
inv = np.asarray(plan_inverse_perm(plan))
unsort_plan = build_gather_plan(np.arange(nse), inv, (nse, n_slots))
print('unsort plan chunks:', unsort_plan.n_chunks, 'pad ratio:', unsort_plan.n_chunks*unsort_plan.chunk/nse)
ones_u = unsort_plan.sort_data(jnp.ones(nse, jnp.float32))
w_back = gather_matvec(unsort_plan, ones_u, ws_ref.reshape(-1))[:nse]
print('unsort exact:', bool(jnp.array_equal(w_back, w)))

# T-sort plan: w_t = data[perm_t]
planT = build_gather_plan(indices, rows, (n,n))
permT_np = np.asarray(planT.perm)
n_slots_t = permT_np.size
valid_t = permT_np.reshape(-1) >= 0
sortT_plan = build_gather_plan(np.arange(n_slots_t)[valid_t], permT_np.reshape(-1)[valid_t], (n_slots_t, nse))
print('sortT plan chunks:', sortT_plan.n_chunks, 'pad ratio:', sortT_plan.n_chunks*sortT_plan.chunk/int(valid_t.sum()))
ones_t = sortT_plan.sort_data(jnp.ones(int(valid_t.sum()), jnp.float32))
wt_ref = planT.sort_data(w)
wt_mxu = gather_matvec(sortT_plan, ones_t, w)[:n_slots_t]
print('sortT exact:', bool(jnp.array_equal(wt_mxu.reshape(permT_np.shape), wt_ref)))

benchmark_function(lambda w_: gather_matvec(sort_plan, ones_sorted, w_), w,
                   name='mxu_sort_1M', iterations=200, loop_arg=0, n_runs=3, n_warmup=2)
benchmark_function(lambda ws: gather_matvec(unsort_plan, ones_u, ws.reshape(-1)), ws_ref,
                   name='mxu_unsort_1M', iterations=200, loop_arg=0, n_runs=3, n_warmup=2)
benchmark_function(lambda w_: gather_matvec(sortT_plan, ones_t, w_), w,
                   name='mxu_sortT_1M', iterations=200, loop_arg=0, n_runs=3, n_warmup=2)
