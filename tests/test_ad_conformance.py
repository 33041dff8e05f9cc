# Copyright 2026 The brainevent-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
# ==============================================================================

"""AD conformance per op family: grad/jvp/vmap vs the dense formulation.

The reference checks every primitive's gradients against the pure-JAX
path (``brainevent/_csr/binary_test.py:582-637``). Here the oracle is the
explicit dense computation under the SAME surrogate-linear contract the
binary primitives define: events enter as float multipliers for AD even
though the forward pass gates them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _csr(rng, m, k):
    mask = rng.random((m, k)) < 0.3
    rows, cols = np.nonzero(mask)
    counts = np.bincount(rows, minlength=m)
    indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]), jnp.int32)
    indices = jnp.asarray(cols, jnp.int32)
    w = jnp.asarray(rng.normal(size=len(cols)), jnp.float32)
    return w, indices, indptr, rows, cols


class TestCsrGrads:
    def test_binary_csrmv_weight_grad_both_directions(self, rng):
        m, k = 14, 18
        w, indices, indptr, rows, cols = _csr(rng, m, k)
        for transpose in (False, True):
            n_in = m if transpose else k
            spk = jnp.asarray(rng.random(n_in) < 0.4)
            cot = jnp.asarray(rng.normal(size=k if transpose else m),
                              jnp.float32)

            def f(w_):
                y = be.binary_csrmv(w_, indices, indptr, spk, shape=(m, k),
                                    transpose=transpose)
                return jnp.vdot(y, cot)

            g = jax.grad(f)(w)
            s = np.asarray(spk, np.float32)
            c = np.asarray(cot)
            # d/dw[e] = gate(src) * cot(dst)
            want = (s[rows] * c[cols]) if transpose else (s[cols] * c[rows])
            np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5,
                                       atol=1e-6, err_msg=f'T={transpose}')

    def test_binary_csrmv_spike_grad_is_float_product(self, rng):
        # surrogate contract: the JVP wrt events is the FLOAT csrmv
        m, k = 12, 12
        w, indices, indptr, rows, cols = _csr(rng, m, k)
        spk = jnp.asarray((rng.random(k) < 0.4).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=m), jnp.float32)

        def f(s_):
            y = be.binary_csrmv(w, indices, indptr, s_, shape=(m, k))
            return jnp.vdot(y, cot)

        g = jax.grad(f)(spk)
        dense = np.zeros((m, k), np.float32)
        dense[rows, cols] = np.asarray(w)
        np.testing.assert_allclose(np.asarray(g), dense.T @ np.asarray(cot),
                                   rtol=1e-5, atol=1e-6)

    def test_csrmm_weight_grad(self, rng):
        m, k, nb = 10, 12, 3
        w, indices, indptr, rows, cols = _csr(rng, m, k)
        B = jnp.asarray(rng.normal(size=(k, nb)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(m, nb)), jnp.float32)

        def f(w_):
            return jnp.vdot(be.csrmm(w_, indices, indptr, B, shape=(m, k)),
                            ct)

        g = jax.grad(f)(w)
        want = (np.asarray(B) @ np.asarray(ct).T)[cols, rows]
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-5)

    def test_binary_csrmv_jvp_matches_grad(self, rng):
        m, k = 10, 12
        w, indices, indptr, _, _ = _csr(rng, m, k)
        spk = jnp.asarray(rng.random(k) < 0.4)

        def f(w_):
            return be.binary_csrmv(w_, indices, indptr, spk, shape=(m, k))

        tang = jnp.asarray(rng.normal(size=w.shape), jnp.float32)
        _, jvp_out = jax.jvp(f, (w,), (tang,))
        # JVP against the jacobian implied by VJP
        jac = jax.jacrev(f)(w)
        np.testing.assert_allclose(np.asarray(jvp_out),
                                   np.asarray(jac) @ np.asarray(tang),
                                   rtol=1e-4, atol=1e-5)

    def test_vmap_csrmv_matches_loop(self, rng):
        m, k = 10, 12
        w, indices, indptr, _, _ = _csr(rng, m, k)
        V = jnp.asarray(rng.normal(size=(5, k)), jnp.float32)
        f = lambda v: be.csrmv(w, indices, indptr, v, shape=(m, k))
        batched = jax.vmap(f)(V)
        looped = jnp.stack([f(V[i]) for i in range(5)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                                   rtol=1e-5, atol=1e-6)


class TestFcnGrads:
    def test_binary_fcnmv_weight_grad_both_directions(self, rng):
        n_pre, n_post, K = 12, 16, 4
        idx_np = rng.integers(0, n_post, (n_pre, K))
        indices = jnp.asarray(idx_np, jnp.int32)
        w = jnp.asarray(rng.normal(size=(n_pre, K)), jnp.float32)
        for transpose in (True, False):
            n_in = n_pre if transpose else n_post
            spk = jnp.asarray(rng.random(n_in) < 0.4)
            cot = jnp.asarray(rng.normal(size=n_post if transpose else n_pre),
                              jnp.float32)

            def f(w_):
                y = be.binary_fcnmv(w_, indices, spk, shape=(n_pre, n_post),
                                    transpose=transpose)
                return jnp.vdot(y, cot)

            g = np.asarray(jax.grad(f)(w))
            s = np.asarray(spk, np.float32)
            c = np.asarray(cot)
            want = np.zeros((n_pre, K), np.float32)
            for i in range(n_pre):
                for j in range(K):
                    tgt = idx_np[i, j]
                    want[i, j] = (s[i] * c[tgt]) if transpose \
                        else (s[tgt] * c[i])
            np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6,
                                       err_msg=f'T={transpose}')

    def test_fcnmv_operand_grad(self, rng):
        n_pre, n_post, K = 12, 16, 4
        idx_np = rng.integers(0, n_post, (n_pre, K))
        indices = jnp.asarray(idx_np, jnp.int32)
        w = jnp.asarray(rng.normal(size=(n_pre, K)), jnp.float32)
        v = jnp.asarray(rng.normal(size=n_post), jnp.float32)
        cot = jnp.asarray(rng.normal(size=n_pre), jnp.float32)

        def f(v_):
            return jnp.vdot(be.fcn.float.fcnmv(
                w, indices, v_, shape=(n_pre, n_post)), cot)

        g = np.asarray(jax.grad(f)(v))
        dense = np.zeros((n_pre, n_post), np.float32)
        for i in range(n_pre):
            for j in range(K):
                dense[i, idx_np[i, j]] += float(w[i, j])
        np.testing.assert_allclose(g, dense.T @ np.asarray(cot),
                                   rtol=1e-4, atol=1e-5)

    def test_vmap_binary_fcnmv(self, rng):
        n_pre, n_post, K = 10, 12, 4
        indices = jnp.asarray(rng.integers(0, n_post, (n_pre, K)), jnp.int32)
        w = jnp.asarray([0.5], jnp.float32)
        S = jnp.asarray(rng.random((6, n_pre)) < 0.3)
        f = lambda s: be.binary_fcnmv(w, indices, s, shape=(n_pre, n_post),
                                      transpose=True)
        batched = jax.vmap(f)(S)
        looped = jnp.stack([f(S[i]) for i in range(6)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                                   rtol=1e-5, atol=1e-6)


class TestJitcGrads:
    def test_jitnmv_param_grads_match_dense(self, rng):
        from brainevent_tpu import jitc
        shape = (16, 24)
        v = jnp.asarray(rng.normal(size=24), jnp.float32)
        cot = jnp.asarray(rng.normal(size=16), jnp.float32)

        def f_implicit(loc, scale):
            return jnp.vdot(jitc.jitnmv(loc, scale, 0.3, v, 11, shape=shape,
                                        corder=True), cot)

        def f_dense(loc, scale):
            M = jitc.jitn(loc, scale, 0.3, 11, shape=shape, corder=True)
            return jnp.vdot(M @ v, cot)

        g_i = jax.grad(f_implicit, argnums=(0, 1))(
            jnp.float32(0.5), jnp.float32(0.2))
        g_d = jax.grad(f_dense, argnums=(0, 1))(
            jnp.float32(0.5), jnp.float32(0.2))
        for gi, gd in zip(g_i, g_d):
            np.testing.assert_allclose(np.asarray(gi), np.asarray(gd),
                                       rtol=1e-4, atol=1e-4)

    def test_jitsmv_vector_grad(self, rng):
        from brainevent_tpu import jitc
        shape = (14, 20)
        v = jnp.asarray(rng.normal(size=20), jnp.float32)
        cot = jnp.asarray(rng.normal(size=14), jnp.float32)

        def f(v_):
            return jnp.vdot(jitc.jitsmv(1.5, 0.25, v_, 3, shape=shape,
                                        corder=True), cot)

        g = jax.grad(f)(v)
        M = np.asarray(jitc.jits(1.5, 0.25, 3, shape=shape, corder=True))
        np.testing.assert_allclose(np.asarray(g), M.T @ np.asarray(cot),
                                   rtol=1e-4, atol=1e-4)


class TestPlasticityGrads:
    def test_weight_grad_is_identity(self, rng):
        # reference contract (brainevent/_dense/plasticity_binary.py:
        # 351-352): the trace addition is constant for AD — the update is
        # identity in the weight; spike/trace are non-differentiable.
        m, k = 8, 10
        w = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        spk = jnp.asarray(rng.random(m) < 0.5)
        trace = jnp.asarray(rng.normal(size=k), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)

        def f(w_):
            return jnp.vdot(be.update_dense_on_binary_pre(w_, spk, trace),
                            ct)

        g = np.asarray(jax.grad(f)(w))
        np.testing.assert_allclose(g, np.asarray(ct), rtol=1e-6)

    def test_csr_weight_grad_is_identity(self, rng):
        m, k = 10, 12
        w, indices, indptr, rows, cols = _csr(rng, m, k)
        spk = jnp.asarray(rng.random(m) < 0.5)
        trace = jnp.asarray(rng.normal(size=k), jnp.float32)
        ct = jnp.asarray(rng.normal(size=w.shape), jnp.float32)

        def f(w_):
            return jnp.vdot(be.update_csr_on_binary_pre(
                w_, indices, indptr, spk, trace, shape=(m, k)), ct)

        g = np.asarray(jax.grad(f)(w))
        np.testing.assert_allclose(g, np.asarray(ct), rtol=1e-6)


class TestDt2tGrads:
    def test_dt2t_grads(self, rng):
        m, k = 10, 12
        w, indices, indptr, rows, cols = _csr(rng, m, k)
        y = jnp.asarray(rng.normal(size=m), jnp.float32)
        nse = w.shape[0]
        ct = jnp.asarray(rng.normal(size=nse), jnp.float32)

        def f(w_, y_):
            return jnp.vdot(be.csrmv_dt2t(y_, w_, indices, indptr,
                                          shape=(m, k)), ct)

        gw, gy = jax.grad(f, argnums=(0, 1))(w, y)
        yn = np.asarray(y)
        cn = np.asarray(ct)
        np.testing.assert_allclose(np.asarray(gw), yn[rows] * cn,
                                   rtol=1e-5, atol=1e-6)
        want_gy = np.zeros(m, np.float32)
        np.add.at(want_gy, rows, np.asarray(w) * cn)
        np.testing.assert_allclose(np.asarray(gy), want_gy,
                                   rtol=1e-5, atol=1e-6)
