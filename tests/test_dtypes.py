# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Dtype-policy tests: int64 index arrays and float64 weights under x64
(mirrors the reference's x64 sweeps, ``brainevent/_test_util.py:45``)."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be


@contextlib.contextmanager
def x64_enabled():
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    try:
        yield
    finally:
        jax.config.update('jax_enable_x64', old)


class TestX64:
    def test_csrmv_f64_i64(self, rng):
        with x64_enabled():
            dense = ((rng.random((10, 12)) < 0.4) * rng.normal(size=(10, 12)))
            A = be.CSR.fromdense(jnp.asarray(dense, dtype=jnp.float64),
                                 index_dtype=jnp.int64)
            assert A.indices.dtype == jnp.int64
            v = jnp.asarray(rng.normal(size=12))
            out = A @ v
            np.testing.assert_allclose(np.asarray(out),
                                       dense @ np.asarray(v), rtol=1e-10)

    def test_binary_csrmv_f64(self, rng):
        with x64_enabled():
            dense = ((rng.random((10, 12)) < 0.4) * rng.normal(size=(10, 12)))
            A = be.CSR.fromdense(jnp.asarray(dense, dtype=jnp.float64))
            spk = rng.random(12) < 0.3
            out = A @ be.BinaryArray(jnp.asarray(spk))
            np.testing.assert_allclose(
                np.asarray(out), dense @ spk.astype(np.float64), rtol=1e-10)

    def test_dense_event_f64(self, rng):
        with x64_enabled():
            w = jnp.asarray(rng.normal(size=(6, 8)))
            spk = jnp.asarray(rng.random(8) < 0.5)
            out = be.binary_densemv(w, spk, transpose=False)
            assert out.dtype == jnp.float64

    def test_fcn_f64(self, rng):
        with x64_enabled():
            indices = jnp.asarray(rng.integers(0, 20, (10, 4)), jnp.int64)
            w = jnp.asarray([0.5])
            spk = jnp.asarray(rng.random(10) < 0.3)
            out = be.binary_fcnmv(w, indices, spk, shape=(10, 20),
                                  transpose=True)
            assert out.shape == (20,)


class TestMixedIndexDtypes:
    def test_uint32_indices(self, rng):
        dense = ((rng.random((8, 8)) < 0.5) * rng.normal(size=(8, 8))
                 ).astype(np.float32)
        rows, cols = np.nonzero(dense)
        counts = np.bincount(rows, minlength=8)
        indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]),
                             dtype=jnp.uint32)
        indices = jnp.asarray(cols, dtype=jnp.uint32)
        data = jnp.asarray(dense[rows, cols])
        v = jnp.asarray(rng.normal(size=8).astype(np.float32))
        out = be.csrmv(data, indices, indptr, v, shape=(8, 8))
        np.testing.assert_allclose(np.asarray(out), dense @ np.asarray(v),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_weights(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 16)), dtype=jnp.bfloat16)
        spk = jnp.asarray(rng.random(16) < 0.4)
        out = be.binary_densemv(w, spk, transpose=False)
        assert out.dtype == jnp.bfloat16

    def test_mismatched_index_dtype_raises(self, rng):
        from brainevent_tpu._error import MathError
        with x64_enabled():
            data = jnp.ones(3)
            indices = jnp.asarray([0, 1, 2], jnp.int32)
            indptr = jnp.asarray([0, 1, 2, 3], jnp.int64)
            with pytest.raises(MathError, match='dtype'):
                be.csrmv(data, indices, indptr, jnp.ones(3), shape=(3, 3))


class TestJITCX64:
    def test_walk_engine_unaffected_by_x64(self, rng):
        """The light-RNG walk is pure uint32; x64 must not change the
        sampled structure."""
        from brainevent_tpu.jitc import jits
        a = np.asarray(jits(1.5, 0.2, 9, shape=(20, 30), corder=True))
        with x64_enabled():
            b = np.asarray(jits(1.5, 0.2, 9, shape=(20, 30), corder=True))
        np.testing.assert_array_equal(a != 0, b != 0)

    def test_jitc_f64_weights(self, rng):
        from brainevent_tpu.jitc import jitnmv
        with x64_enabled():
            v = jnp.asarray(rng.normal(size=30))
            out = jitnmv(jnp.float64(0.5), jnp.float64(0.1), 0.2, v, 9,
                         shape=(20, 30), corder=True)
            assert out.dtype == jnp.float64
