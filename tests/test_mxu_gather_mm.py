# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Plan-based batched (mat-mat) MXU gather kernel (round 5).

The mm analog of the blocked one-hot gather matvec: mm-tuned (128, 128)
tiles, whole bf16-split operand VMEM-resident, one K=passes*128 dot per
stage per chunk. Measured v5e (BENCH_NOTES r5): 4.2 ms exact / 2.5 ms at
passes=2 vs 16.5 ms segment-sum at the reference's (10k, 10k, 1%, B=256)
row (``/root/reference/brainevent/_csr/binary.py:757-824``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import brainevent_tpu as be
from brainevent_tpu.ops import mxu_gather as mg


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _random_structure(rng, M, N, nse):
    rows = np.sort(rng.integers(0, M, nse))
    cols = rng.integers(0, N, nse)
    return rows, cols


def _dense_of(rows, cols, w, M, N):
    d = np.zeros((M, N), np.float32)
    np.add.at(d, (rows, cols), np.asarray(w))
    return d


class TestGatherMatmat:

    @pytest.mark.parametrize('M,N,B,nse', [
        (256, 256, 16, 900),       # aligned
        (500, 700, 36, 3000),      # nothing divides anything
        (129, 1000, 130, 2000),    # B > 128 (lane padding)
    ])
    def test_kernel_matches_dense(self, rng, M, N, B, nse):
        rows, cols = _random_structure(rng, M, N, nse)
        plan = mg.build_mm_plan(rows, cols, (M, N))
        w = jnp.asarray(rng.normal(size=nse), jnp.float32)
        ws = plan.sort_data(w)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        want = _dense_of(rows, cols, w, M, N) @ np.asarray(X)
        got = mg.gather_matmat(plan, ws, X)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)
        got_xla = mg.gather_matmat_xla(plan, ws, X)
        np.testing.assert_allclose(np.asarray(got_xla), want,
                                   rtol=2e-5, atol=2e-5)

    def test_homogeneous_weight_broadcast(self, rng):
        M, N, B, nse = 200, 300, 8, 1500
        rows, cols = _random_structure(rng, M, N, nse)
        plan = mg.build_mm_plan(rows, cols, (M, N))
        ws = plan.sort_data(jnp.asarray([0.5], jnp.float32))
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        want = _dense_of(rows, cols, np.full(nse, 0.5, np.float32),
                         M, N) @ np.asarray(X)
        got = mg.gather_matmat(plan, ws, X)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)

    def test_passes_2_close(self, rng):
        M, N, B, nse = 256, 256, 16, 2000
        rows, cols = _random_structure(rng, M, N, nse)
        plan = mg.build_mm_plan(rows, cols, (M, N))
        w = jnp.asarray(rng.normal(size=nse), jnp.float32)
        ws = plan.sort_data(w)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        want = _dense_of(rows, cols, w, M, N) @ np.asarray(X)
        got = mg.gather_matmat(plan, ws, X, passes=2)
        scale = np.abs(want).max() + 1e-9
        assert np.abs(np.asarray(got) - want).max() / scale < 1e-3

    def test_vjp_rides_transposed_plan(self, rng):
        M, N, B, nse = 300, 280, 12, 2500
        rows, cols = _random_structure(rng, M, N, nse)
        plan = mg.build_mm_plan(rows, cols, (M, N))
        plan_t = mg.build_mm_plan(cols, rows, (N, M))
        w = jnp.asarray(rng.normal(size=nse), jnp.float32)
        ws, wt = plan.sort_data(w), plan_t.sort_data(w)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(M, B)), jnp.float32)
        d = _dense_of(rows, cols, w, M, N)

        out, vjp = jax.vjp(
            lambda x: mg.plan_matmat_vjp(plan, plan_t, ws, wt, x), X)
        np.testing.assert_allclose(np.asarray(out), d @ np.asarray(X),
                                   rtol=2e-5, atol=2e-5)
        (x_bar,) = vjp(ct)
        np.testing.assert_allclose(np.asarray(x_bar), d.T @ np.asarray(ct),
                                   rtol=2e-5, atol=2e-5)

    def test_vmem_gate_falls_back_to_oracle(self, rng):
        M, N, B, nse = 128, 256, 8, 500
        rows, cols = _random_structure(rng, M, N, nse)
        plan = mg.build_mm_plan(rows, cols, (M, N))
        w = jnp.asarray(rng.normal(size=nse), jnp.float32)
        ws = plan.sort_data(w)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        want = _dense_of(rows, cols, w, M, N) @ np.asarray(X)
        got = mg.gather_matmat(plan, ws, X, force_xla=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)


class TestClassPlanMMRoute:
    """CSR/CSC/FCN 2-D products fall through to the plan mm kernel when
    the dense mirror exceeds the budget."""

    @pytest.fixture(autouse=True)
    def _force_route(self):
        be.config.set_auto_mxu_plan(True)
        be.config.set_dense_mm_max_bytes(1)
        be.config.set_mxu_plan_min_nse(1)
        yield
        be.config.set_auto_mxu_plan('auto')
        be.config.set_dense_mm_max_bytes(128 * 1024 * 1024)
        be.config.set_mxu_plan_min_nse(65536)

    def test_csr_both_directions_and_grad(self, rng):
        M, N, B = 260, 340, 10
        d = jnp.where(jnp.asarray(rng.random((M, N)) < .05),
                      jnp.asarray(rng.normal(size=(M, N)), jnp.float32), 0.)
        csr = be.CSR.fromdense(d)
        dn = np.asarray(d)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)
        np.testing.assert_allclose(np.asarray(csr @ X), dn @ np.asarray(X),
                                   rtol=2e-5, atol=2e-5)
        assert getattr(csr, '_mm_plans', None) is not None
        Xt = jnp.asarray(rng.normal(size=(M, B)), jnp.float32)
        np.testing.assert_allclose(np.asarray(csr.T @ Xt),
                                   dn.T @ np.asarray(Xt),
                                   rtol=2e-5, atol=2e-5)
        g = jax.grad(lambda x: (csr @ x).sum())(X)
        np.testing.assert_allclose(
            np.asarray(g), dn.T @ np.ones((M, B), np.float32),
            rtol=2e-5, atol=2e-5)

    def test_fcn_scatter_direction(self, rng):
        n_pre, n_post, K, B = 200, 260, 9, 14
        idx = jnp.asarray(rng.integers(0, n_post, (n_pre, K)), jnp.int32)
        w = jnp.asarray(rng.normal(size=(n_pre, K)), jnp.float32)
        fcn = be.FixedNumPerPre((w, idx), shape=(n_pre, n_post))
        dn = np.zeros((n_pre, n_post), np.float32)
        np.add.at(dn, (np.repeat(np.arange(n_pre), K),
                       np.asarray(idx).reshape(-1)),
                  np.asarray(w).reshape(-1))
        X = jnp.asarray(rng.normal(size=(n_pre, B)), jnp.float32)
        fT = fcn.T          # hold the view: the plan pair caches on it
        np.testing.assert_allclose(np.asarray(fT @ X),
                                   dn.T @ np.asarray(X),
                                   rtol=2e-5, atol=2e-5)
        assert (getattr(fT, '_mm_plans', None) is not None
                or getattr(fcn, '_mm_plans', None) is not None)

    def test_traced_data_stays_on_primitive(self, rng):
        # AD w.r.t. data must stay exact on the XLA primitive: a traced-
        # data instance never takes the plan route
        M, N, B = 200, 200, 6
        d = jnp.where(jnp.asarray(rng.random((M, N)) < .05),
                      jnp.asarray(rng.normal(size=(M, N)), jnp.float32), 0.)
        csr = be.CSR.fromdense(d)
        X = jnp.asarray(rng.normal(size=(N, B)), jnp.float32)

        def loss(data):
            return (csr.with_data(data) @ X).sum()

        g = jax.grad(loss)(csr.data)
        # reference gradient: d(sum)/d(data[e]) = sum_b X[col_e, b]
        rows, cols = be.csr_to_coo_index(csr.indptr, csr.indices)
        want = np.asarray(X).sum(1)[np.asarray(cols)]
        np.testing.assert_allclose(np.asarray(g), want, rtol=2e-5,
                                   atol=2e-5)
