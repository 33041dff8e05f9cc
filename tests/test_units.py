# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Unit propagation through the public wrappers, with brainunit active.

The image has no ``brainunit``; ``tests/_brainunit_fixture.py`` vendors the
exact interface the shim consumes and is injected as the real package for
this module, so ``brainevent_tpu.units`` takes its REAL quantity-aware
branches (not the degraded plain-array path). Semantics under test match
the reference wrappers (``/root/reference/brainevent/_csr/binary.py:
248-260``): outputs carry ``unit(weights) * unit(operand)``; unit-less
inputs stay unit-less.
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    '_brainunit_fixture',
    _os.path.join(_os.path.dirname(__file__), '_brainunit_fixture.py'))
bu_fixture = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(bu_fixture)


@pytest.fixture(scope='module', autouse=True)
def brainunit_active():
    """Install the vendored brainunit and rebind the shim's globals."""
    import brainevent_tpu.units as units_mod
    had = 'brainunit' in sys.modules
    old = sys.modules.get('brainunit')
    sys.modules['brainunit'] = bu_fixture
    importlib.reload(units_mod)
    assert units_mod.HAS_BRAINUNIT
    yield
    if had:
        sys.modules['brainunit'] = old
    else:
        del sys.modules['brainunit']
    importlib.reload(units_mod)


@pytest.fixture(scope='module')
def csr_data():
    rng = np.random.default_rng(5)
    deg = rng.poisson(6, 40)
    indptr = jnp.asarray(np.concatenate([[0], np.cumsum(deg)]), jnp.int32)
    nnz = int(indptr[-1])
    idx = jnp.asarray(rng.integers(0, 50, nnz), jnp.int32)
    w = jnp.asarray(rng.normal(size=nnz), jnp.float32)
    return w, idx, indptr, nnz


def test_binary_csrmv_weight_unit_roundtrip(csr_data):
    from brainevent_tpu.csr.binary import binary_csrmv
    w, idx, indptr, nnz = csr_data
    spk = jnp.asarray(np.random.default_rng(0).random(50) < 0.2)
    wq = bu_fixture.Quantity(w, bu_fixture.siemens)
    out = binary_csrmv(wq, idx, indptr, spk, shape=(40, 50))
    assert isinstance(out, bu_fixture.Quantity)
    assert out.unit == bu_fixture.siemens
    plain = binary_csrmv(w, idx, indptr, spk, shape=(40, 50))
    np.testing.assert_array_equal(np.asarray(out.mantissa),
                                  np.asarray(plain))
    # unit-less stays unit-less
    assert not isinstance(plain, bu_fixture.Quantity)


def test_csrmv_unit_product(csr_data):
    from brainevent_tpu.csr.float import csrmv
    w, idx, indptr, nnz = csr_data
    v = jnp.asarray(np.random.default_rng(1).normal(size=50), jnp.float32)
    wq = bu_fixture.Quantity(w, bu_fixture.siemens)
    vq = bu_fixture.Quantity(v, bu_fixture.mV)
    out = csrmv(wq, idx, indptr, vq, shape=(40, 50))
    assert isinstance(out, bu_fixture.Quantity)
    assert out.unit == bu_fixture.siemens * bu_fixture.mV
    plain = csrmv(w, idx, indptr, v, shape=(40, 50))
    np.testing.assert_allclose(np.asarray(out.mantissa), np.asarray(plain),
                               rtol=1e-6)


def test_binary_fcnmv_unit_roundtrip():
    from brainevent_tpu.fcn.binary import binary_fcnmv
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, 60, (30, 8)), jnp.int32)
    w = jnp.asarray([0.5], jnp.float32)
    spk = jnp.asarray(rng.random(60) < 0.3)
    wq = bu_fixture.Quantity(w, bu_fixture.mV)
    out = binary_fcnmv(wq, idx, spk, shape=(30, 60))
    assert isinstance(out, bu_fixture.Quantity)
    assert out.unit == bu_fixture.mV
    plain = binary_fcnmv(w, idx, spk, shape=(30, 60))
    np.testing.assert_array_equal(np.asarray(out.mantissa),
                                  np.asarray(plain))


def test_jitn_dense_weight_units():
    from brainevent_tpu.jitc import jitn
    loc = bu_fixture.Quantity(jnp.float32(0.5), bu_fixture.siemens)
    scale = bu_fixture.Quantity(jnp.float32(1.5), bu_fixture.siemens)
    out = jitn(loc, scale, 0.2, 42, shape=(20, 30))
    assert isinstance(out, bu_fixture.Quantity)
    assert out.unit == bu_fixture.siemens
    plain = jitn(0.5, 1.5, 0.2, 42, shape=(20, 30))
    np.testing.assert_array_equal(np.asarray(out.mantissa),
                                  np.asarray(plain))


def test_jitnmv_unit_product():
    from brainevent_tpu.jitc import jitnmv
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=30), jnp.float32)
    loc = bu_fixture.Quantity(jnp.float32(0.5), bu_fixture.siemens)
    scale = bu_fixture.Quantity(jnp.float32(1.5), bu_fixture.siemens)
    vq = bu_fixture.Quantity(v, bu_fixture.mV)
    out = jitnmv(loc, scale, 0.2, vq, 42, shape=(20, 30))
    assert isinstance(out, bu_fixture.Quantity)
    assert out.unit == bu_fixture.siemens * bu_fixture.mV
    plain = jitnmv(0.5, 1.5, 0.2, v, 42, shape=(20, 30))
    np.testing.assert_allclose(np.asarray(out.mantissa), np.asarray(plain),
                               rtol=1e-6)


def test_dimensionless_collapses_to_array():
    from brainevent_tpu.units import maybe_unit
    x = jnp.ones(4)
    out = maybe_unit(x, bu_fixture.DIMENSIONLESS)
    assert not isinstance(out, bu_fixture.Quantity)
