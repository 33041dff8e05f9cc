# A/B: boolean-mask index compaction strategies on TPU.
#
# jnp.nonzero(size=cap) lowers to cumsum + 14ns/elem scatter (579 us at
# 64k on v5e — the single largest phase of the JITCNet step). Candidates:
#   nonzero  - jnp.nonzero(mask, size=cap, fill_value=n)
#   sort     - lax.sort(where(mask, iota, n))[:cap]   (1-operand flat)
#   topk     - lax.top_k(-keys, cap) negated
#
# Usage: python scripts/tpu_compact_ab.py [iters]

import sys
import time

import jax
import jax.numpy as jnp

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
cap = 500
rate = 0.0022


def timed(fn, masks):
    def loop(k, a):
        def body(i, carry):
            r = fn(a[i % a.shape[0]])
            return carry + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.))

    jk = jax.jit(loop, static_argnums=0)
    float(jk(1, masks)); float(jk(iters, masks))
    t0 = time.perf_counter(); float(jk(1, masks)); t1 = time.perf_counter()
    float(jk(iters, masks)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e6


for n in (4000, 16000, 64000, 320000):
    key = jax.random.PRNGKey(3)
    masks = jax.random.uniform(key, (8, n)) < rate

    def via_nonzero(m, n=n):
        (ids,) = jnp.nonzero(m, size=cap, fill_value=n)
        return ids

    def via_sort(m, n=n):
        keys = jnp.where(m, jax.lax.iota(jnp.int32, n), jnp.int32(n))
        return jax.lax.sort(keys)[:cap]

    def via_topk(m, n=n):
        keys = jnp.where(m, jax.lax.iota(jnp.int32, n), jnp.int32(n))
        vals, _ = jax.lax.top_k(-keys, cap)
        return -vals

    a = jax.jit(via_nonzero)(masks[0])
    b = jax.jit(via_sort)(masks[0])
    c = jax.jit(via_topk)(masks[0])
    ok_s = bool(jnp.all(a == b))
    ok_t = bool(jnp.all(a == c))
    t_n = timed(via_nonzero, masks)
    t_s = timed(via_sort, masks)
    t_t = timed(via_topk, masks)
    print(f'n={n:7d}  nonzero {t_n:8.1f} us   sort {t_s:8.1f} us '
          f'(match={ok_s})   topk {t_t:8.1f} us (match={ok_t})',
          flush=True)
print('DONE')
