# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Conformance of the real Mosaic event kernels against the XLA backend.

``backend='pallas'`` for ``binary_fcnmv`` (both directions) and
``binary_csrmv`` (gather direction) runs genuinely different code from
``jax_raw`` (``fcn/pallas_kernels.py``, ``csr/pallas_kernels.py``); these
sweeps prove agreement across shapes, rates (including zero and
saturating), weight layouts, float-gated events, and the compaction
overflow rounds — in interpret mode on CPU, compiled on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainevent_tpu.csr.binary import binary_csrmv_p_call
from brainevent_tpu.fcn.binary import binary_fcnmv_p_call


@pytest.mark.parametrize('n_pre,n_post,K', [(100, 200, 10), (1000, 1000, 80),
                                            (300, 130, 7)])
@pytest.mark.parametrize('rate', [0.0, 0.05, 1.0])
@pytest.mark.parametrize('transpose', [False, True])
@pytest.mark.parametrize('homo', [True, False])
def test_fcn_pallas_vs_jax(n_pre, n_post, K, rate, transpose, homo):
    rng = np.random.default_rng(hash((n_pre, K, transpose)) % 2**31)
    idx = jnp.asarray(rng.integers(0, n_post, (n_pre, K)), jnp.int32)
    m = n_pre if transpose else n_post
    spk = jnp.asarray(rng.random(m) < rate)
    w = (jnp.asarray([0.5], jnp.float32) if homo
         else jnp.asarray(rng.normal(size=(n_pre, K)), jnp.float32))
    ref = binary_fcnmv_p_call(w, idx, spk, shape=(n_pre, n_post),
                              transpose=transpose, backend='jax_raw')[0]
    got = binary_fcnmv_p_call(w, idx, spk, shape=(n_pre, n_post),
                              transpose=transpose, backend='pallas')[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_fcn_pallas_float_gated_events():
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, 500, (500, 20)), jnp.int32)
    spk = jnp.asarray(rng.random(500) * (rng.random(500) < 0.05))
    w = jnp.asarray([1.5], jnp.float32)
    for transpose in (False, True):
        ref = binary_fcnmv_p_call(w, idx, spk, shape=(500, 500),
                                  transpose=transpose,
                                  backend='jax_raw')[0]
        got = binary_fcnmv_p_call(w, idx, spk, shape=(500, 500),
                                  transpose=transpose, backend='pallas')[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize('n,m,avg_deg', [(50, 70, 5), (1000, 1000, 20),
                                         (257, 130, 3)])
@pytest.mark.parametrize('rate', [0.0, 0.05, 0.5])
@pytest.mark.parametrize('homo', [True, False])
def test_csr_gather_pallas_vs_jax(n, m, avg_deg, rate, homo):
    rng = np.random.default_rng(hash((n, m, avg_deg)) % 2**31)
    deg = rng.poisson(avg_deg, n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    nnz = int(indptr[-1])
    idx = jnp.asarray(rng.integers(0, m, nnz), jnp.int32)
    indptr = jnp.asarray(indptr)
    spk = jnp.asarray(rng.random(m) < rate)
    w = (jnp.asarray([0.7], jnp.float32) if homo
         else jnp.asarray(rng.normal(size=nnz), jnp.float32))
    ref = binary_csrmv_p_call(w, idx, indptr, spk, shape=(n, m),
                              transpose=False, backend='jax_raw')[0]
    got = binary_csrmv_p_call(w, idx, indptr, spk, shape=(n, m),
                              transpose=False, backend='pallas')[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_csr_gather_pallas_empty_rows_and_jit():
    """Rows with zero nonzeros + jit wrapping + grad passthrough."""
    rng = np.random.default_rng(9)
    deg = rng.poisson(4, 64)
    deg[::5] = 0
    indptr = jnp.asarray(np.concatenate([[0], np.cumsum(deg)]), jnp.int32)
    nnz = int(indptr[-1])
    idx = jnp.asarray(rng.integers(0, 96, nnz), jnp.int32)
    spk = jnp.asarray(rng.random(96) < 0.2)
    w = jnp.asarray(rng.normal(size=nnz), jnp.float32)

    fn = jax.jit(lambda w: binary_csrmv_p_call(
        w, idx, indptr, spk, shape=(64, 96), transpose=False,
        backend='pallas')[0])
    ref = binary_csrmv_p_call(w, idx, indptr, spk, shape=(64, 96),
                              transpose=False, backend='jax_raw')[0]
    np.testing.assert_allclose(np.asarray(fn(w)), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)

    g = jax.grad(lambda w: fn(w).sum())(w)
    assert g.shape == w.shape and bool(jnp.isfinite(g).all())
