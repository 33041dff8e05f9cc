# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Blocked one-hot MXU gather plans: layout round-trips, the fused
matvec+dw kernel (the surrogate-training backward), and AD through the
registered primitive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainevent_tpu.ops.mxu_gather import (
    GatherPlan, build_gather_plan, plan_from_csr, plan_from_ell,
    gather_matvec, gather_matvec_xla, plan_matvec,
    plan_matvec_dw, matvec_dw_xla, plan_inverse_perm,
)


def _dense_of(rows, cols, data, shape):
    W = np.zeros(shape, np.float32)
    np.add.at(W, (rows, cols), data)
    return W


class TestPlanLayout:
    @pytest.mark.parametrize('shape,nse', [((200, 300), 2000),
                                           ((513, 129), 777)])
    def test_sort_data_roundtrip(self, shape, nse, rng):
        rows = np.sort(rng.integers(0, shape[0], nse))
        cols = rng.integers(0, shape[1], nse)
        plan = build_gather_plan(rows, cols, shape)
        data = rng.normal(size=nse).astype(np.float32)
        w_sorted = plan.sort_data(jnp.asarray(data))
        inv = plan_inverse_perm(plan)
        back = np.asarray(w_sorted).reshape(-1)[np.asarray(inv)]
        np.testing.assert_allclose(back, data)

    def test_homogeneous_broadcast(self, rng):
        plan = plan_from_ell(rng.integers(0, 64, (64, 4)), (64, 64))
        w = plan.sort_data(jnp.asarray([2.5], jnp.float32))
        valid = np.asarray(plan.perm) >= 0
        assert (np.asarray(w)[valid] == 2.5).all()
        assert (np.asarray(w)[~valid] == 0).all()

    def test_empty_plan(self):
        plan = build_gather_plan(np.zeros(0, np.int64),
                                 np.zeros(0, np.int64), (32, 32))
        x = jnp.ones(32)
        y = gather_matvec_xla(plan, plan.sort_data(jnp.zeros(0)), x)
        np.testing.assert_allclose(np.asarray(y), 0.0)


class TestGatherMatvec:
    @pytest.mark.parametrize('shape,nse', [((256, 256), 3000),
                                           ((1000, 500), 5000)])
    def test_matches_dense(self, shape, nse, rng):
        rows = np.sort(rng.integers(0, shape[0], nse))
        cols = rng.integers(0, shape[1], nse)
        data = rng.normal(size=nse).astype(np.float32)
        plan = build_gather_plan(rows, cols, shape)
        w_sorted = plan.sort_data(jnp.asarray(data))
        x = jnp.asarray(rng.normal(size=shape[1]), jnp.float32)
        y = gather_matvec(plan, w_sorted, x)
        np.testing.assert_allclose(
            np.asarray(y), _dense_of(rows, cols, data, shape) @
            np.asarray(x), rtol=2e-4, atol=2e-4)

    def test_primitive_grad(self, rng):
        shape, nse = (128, 128), 800
        rows = np.sort(rng.integers(0, shape[0], nse))
        cols = rng.integers(0, shape[1], nse)
        data = rng.normal(size=nse).astype(np.float32)
        plan = build_gather_plan(rows, cols, shape)
        w_sorted = plan.sort_data(jnp.asarray(data))
        x = jnp.asarray(rng.normal(size=shape[1]), jnp.float32)

        g = jax.grad(lambda xx: jnp.sum(plan_matvec(plan, w_sorted, xx)))(x)
        W = _dense_of(rows, cols, data, shape)
        np.testing.assert_allclose(np.asarray(g), W.sum(0), rtol=2e-4,
                                   atol=2e-4)


class TestFusedMatvecDw:
    @pytest.mark.parametrize('n,K', [(300, 8), (257, 5), (1024, 16)])
    def test_matches_oracle(self, n, K, rng):
        ell = rng.integers(0, n, (n, K))
        plan = plan_from_ell(ell, (n, n))
        data = rng.normal(size=n * K).astype(np.float32)
        w_sorted = plan.sort_data(jnp.asarray(data))
        x = jnp.asarray(rng.normal(size=n), jnp.float32)
        s = jnp.asarray((rng.random(n) < 0.2).astype(np.float32))
        y1, dw1 = matvec_dw_xla(plan, w_sorted, s, x)
        y2, dw2 = plan_matvec_dw(plan, w_sorted, s, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-5)
        valid = np.asarray(plan.perm) >= 0
        np.testing.assert_allclose(np.asarray(dw1)[valid],
                                   np.asarray(dw2)[valid],
                                   rtol=2e-5, atol=2e-5)

    def test_dw_semantics(self, rng):
        n, K = 200, 6
        ell = rng.integers(0, n, (n, K))
        plan = plan_from_ell(ell, (n, n))
        w_sorted = plan.sort_data(
            jnp.asarray(rng.normal(size=n * K), jnp.float32))
        x = jnp.asarray(rng.normal(size=n), jnp.float32)
        s = jnp.asarray((rng.random(n) < 0.3).astype(np.float32))
        _, dw = plan_matvec_dw(plan, w_sorted, s, x)
        inv = plan_inverse_perm(plan)
        dw_flat = np.asarray(dw).reshape(-1)[np.asarray(inv)]
        expect = (np.asarray(s)[np.repeat(np.arange(n), K)]
                  * np.asarray(x)[ell.reshape(-1)])
        np.testing.assert_allclose(dw_flat, expect, rtol=2e-5, atol=2e-5)

    def test_dense_spikes_rate_independence(self, rng):
        # ALL neurons firing: the plan route must stay exact (the event
        # formulations degrade/fallback at high rates; this one cannot)
        n, K = 160, 4
        ell = rng.integers(0, n, (n, K))
        plan = plan_from_ell(ell, (n, n))
        w_sorted = plan.sort_data(
            jnp.asarray(rng.normal(size=n * K), jnp.float32))
        x = jnp.asarray(rng.normal(size=n), jnp.float32)
        s = jnp.ones(n, jnp.float32)
        y1, dw1 = matvec_dw_xla(plan, w_sorted, s, x)
        y2, dw2 = plan_matvec_dw(plan, w_sorted, s, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-5)
        # dw is only defined at valid slots (padding decodes to junk —
        # the documented contract; consumers read through inverse perm)
        valid = np.asarray(plan.perm) >= 0
        np.testing.assert_allclose(np.asarray(dw1)[valid],
                                   np.asarray(dw2)[valid],
                                   rtol=2e-5, atol=2e-5)
