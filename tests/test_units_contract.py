# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Contract tests binding the vendored brainunit stand-in to the REAL
package's documented semantics (VERDICT r4 item 8b).

One parametrized suite runs the same assertions against BOTH unit
providers:

- ``vendored`` — ``tests/_brainunit_fixture.py`` (always runs; this is
  the diff-check that the stand-in implements brainunit's documented
  behavior, reference consumer contract
  ``/root/reference/brainevent/_csr/binary.py:248-260``);
- ``real`` — the actual ``brainunit`` package when installed
  (asserted-skipped on images without it, so CI environments with
  brainunit exercise ``brainevent_tpu.units`` against the real thing
  with zero extra code).

The assertions are written only against behavior brainunit documents:
``Quantity`` splits into (mantissa, unit); ``get_mantissa`` passes
plain arrays through; ``maybe_decimal`` collapses dimensionless
quantities; unit algebra composes dimensions; ``array * unit``
constructs a Quantity.
"""

import importlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest


def _load(provider: str):
    if provider == 'real':
        bu = pytest.importorskip(
            'brainunit',
            reason='real brainunit not installed on this image '
                   '(the vendored leg below still runs)')
        return bu
    from tests import _brainunit_fixture as bu
    return bu


@pytest.fixture(params=['vendored', 'real'])
def bu(request):
    return _load(request.param)


@pytest.fixture
def units_mod(bu, monkeypatch):
    """brainevent_tpu.units reloaded against the selected provider."""
    monkeypatch.setitem(sys.modules, 'brainunit', bu)
    import brainevent_tpu.units as units
    units = importlib.reload(units)
    yield units
    monkeypatch.delitem(sys.modules, 'brainunit', raising=False)
    importlib.reload(units)


class TestProviderContract:
    """brainunit's documented semantics, asserted provider-agnostically."""

    def test_quantity_splits_to_mantissa_and_unit(self, bu):
        q = jnp.asarray([1.0, 2.0, 3.0]) * bu.mV
        m, u = bu.split_mantissa_unit(q)
        np.testing.assert_allclose(np.asarray(m), [1.0, 2.0, 3.0])
        assert u == bu.mV

    def test_plain_array_is_dimensionless(self, bu):
        x = jnp.asarray([4.0, 5.0])
        m, u = bu.split_mantissa_unit(x)
        np.testing.assert_allclose(np.asarray(m), [4.0, 5.0])
        # documented: a bare array has the dimensionless unit
        assert getattr(u, 'is_dimensionless', None) in (True,) or (
            u == bu.DIMENSIONLESS)

    def test_get_mantissa_passthrough(self, bu):
        x = jnp.asarray([7.0])
        assert bu.get_mantissa(x) is x
        q = x * bu.ms
        np.testing.assert_allclose(np.asarray(bu.get_mantissa(q)), [7.0])

    def test_maybe_decimal_collapses_dimensionless(self, bu):
        q = (jnp.asarray([2.0]) * bu.mV) * (1.0 / bu.mV
                                            if hasattr(bu.mV, '__rtruediv__')
                                            else bu.DIMENSIONLESS)
        # construct dimensionless robustly: unit / itself
        unit_ratio = bu.mV / bu.mV
        q = jnp.asarray([2.0]) * unit_ratio if not isinstance(
            unit_ratio, (int, float)) else jnp.asarray([2.0])
        out = bu.maybe_decimal(q)
        np.testing.assert_allclose(np.asarray(bu.get_mantissa(out)), [2.0])
        # documented: dimensionless maybe_decimal returns a PLAIN array
        assert not hasattr(out, 'unit') or getattr(
            getattr(out, 'unit', None), 'is_dimensionless', False)

    def test_unit_algebra_composes(self, bu):
        prod = bu.mV * bu.siemens     # V * S = A (a current unit)
        q = jnp.asarray([3.0]) * prod
        m, u = bu.split_mantissa_unit(q)
        np.testing.assert_allclose(np.asarray(m), [3.0])
        assert not getattr(u, 'is_dimensionless', False)

    def test_quantity_times_quantity_multiplies_mantissas(self, bu):
        a = jnp.asarray([2.0]) * bu.mV
        b = jnp.asarray([4.0]) * bu.siemens
        c = a * b
        np.testing.assert_allclose(
            np.asarray(bu.get_mantissa(c)), [8.0])


class TestUnitsModuleAgainstProvider:
    """brainevent_tpu.units behaves identically over both providers."""

    def test_is_quantity(self, bu, units_mod):
        assert units_mod.is_quantity(jnp.asarray([1.0]) * bu.mV)
        assert not units_mod.is_quantity(jnp.asarray([1.0]))

    def test_split_roundtrip(self, bu, units_mod):
        q = jnp.asarray([1.5, 2.5]) * bu.mV
        m, u = units_mod.split_mantissa_unit(q)
        np.testing.assert_allclose(np.asarray(m), [1.5, 2.5])
        assert u is not None

    def test_get_mantissa_plain(self, bu, units_mod):
        x = jnp.asarray([9.0])
        assert units_mod.get_mantissa(x) is x
