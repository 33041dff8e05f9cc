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

"""Unit-propagation sweep over EVERY unit-aware public wrapper
(VERDICT r3 item 7 corpus depth; reference discipline:
``brainevent/_csr/binary.py:248-260`` — outputs carry
``unit(weights) * unit(operand)``, unit-less stays unit-less).

Table-driven: each case builds the op twice (Quantity inputs / plain
inputs) and asserts (a) the declared unit law and (b) mantissa equality
with the plain call. Uses the vendored brainunit fixture like
``test_units.py``."""

import importlib
import importlib.util as _ilu
import os as _os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_spec = _ilu.spec_from_file_location(
    '_brainunit_fixture',
    _os.path.join(_os.path.dirname(__file__), '_brainunit_fixture.py'))
bu = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(bu)


@pytest.fixture(scope='module', autouse=True)
def brainunit_active():
    import brainevent_tpu.units as units_mod
    had = 'brainunit' in sys.modules
    old = sys.modules.get('brainunit')
    sys.modules['brainunit'] = bu
    importlib.reload(units_mod)
    assert units_mod.HAS_BRAINUNIT
    yield
    if had:
        sys.modules['brainunit'] = old
    else:
        del sys.modules['brainunit']
    importlib.reload(units_mod)


_rng = np.random.default_rng(7)
M, K = 24, 32
_deg = _rng.poisson(4, M)
IPTR = jnp.asarray(np.concatenate([[0], np.cumsum(_deg)]), jnp.int32)
NSE = int(IPTR[-1])
IDX = jnp.asarray(_rng.integers(0, K, NSE), jnp.int32)
W = jnp.asarray(_rng.normal(size=NSE), jnp.float32)
VK = jnp.asarray(_rng.normal(size=K), jnp.float32)
VM = jnp.asarray(_rng.normal(size=M), jnp.float32)
BK = jnp.asarray(_rng.normal(size=(K, 3)), jnp.float32)
SPK_K = jnp.asarray(_rng.random(K) < 0.3)
SPK_M = jnp.asarray(_rng.random(M) < 0.3)
SPKM_K = jnp.asarray(_rng.random((K, 3)) < 0.3)
ELL = jnp.asarray(_rng.integers(0, K, (M, 4)), jnp.int32)
WELL = jnp.asarray(_rng.normal(size=(M, 4)), jnp.float32)
WD = jnp.asarray(_rng.normal(size=(M, K)), jnp.float32)

S = bu.siemens
MV = bu.mV


def q(x, unit):
    return bu.Quantity(x, unit)


# Each case: name -> (fn(unitize) -> output, expected unit or None).
# `u(x, unit)` wraps only when unitize is True.
def _case_table():
    import brainevent_tpu as be

    def mk(fn, expect):
        return (fn, expect)

    cases = {}

    def u(x, unit, on):
        return q(x, unit) if on else x

    # ---- csr family -------------------------------------------------------
    cases['binary_csrmv'] = mk(
        lambda on: be.binary_csrmv(u(W, S, on), IDX, IPTR, SPK_K,
                                   shape=(M, K)), S)
    cases['binary_csrmm'] = mk(
        lambda on: be.binary_csrmm(u(W, S, on), IDX, IPTR, SPKM_K,
                                   shape=(M, K)), S)
    cases['csrmv'] = mk(
        lambda on: be.csrmv(u(W, S, on), IDX, IPTR, u(VK, MV, on),
                            shape=(M, K)), S * MV)
    cases['csrmm'] = mk(
        lambda on: be.csrmm(u(W, S, on), IDX, IPTR, u(BK, MV, on),
                            shape=(M, K)), S * MV)
    cases['csrmv_dt2t'] = mk(
        lambda on: be.csrmv_dt2t(u(VM, MV, on), u(W, S, on), IDX, IPTR,
                                 shape=(M, K)), S * MV)
    cases['csrmm_dt2t'] = mk(
        lambda on: be.csrmm_dt2t(u(jnp.stack([VM, VM], 1), MV, on),
                                 u(W, S, on), IDX, IPTR,
                                 shape=(M, K)), S * MV)
    cases['update_csr_on_binary_pre'] = mk(
        lambda on: be.update_csr_on_binary_pre(
            u(W, S, on), IDX, IPTR, SPK_M, u(VK, S, on), shape=(M, K)), S)
    cases['update_csr_on_binary_post'] = mk(
        lambda on: be.update_csr_on_binary_post(
            u(W, S, on), IDX, IPTR, None, u(VM, S, on), SPK_K,
            shape=(M, K)), S)
    cases['csr_slice_rows'] = mk(
        lambda on: be.csr_slice_rows(u(W, S, on), IDX, IPTR,
                                     jnp.arange(5, dtype=jnp.int32),
                                     shape=(M, K)), S)
    cases['binary_csrmv_indexed'] = mk(
        lambda on: be.binary_csrmv_indexed(
            u(W, S, on), IDX, IPTR, jnp.arange(NSE, dtype=jnp.int32),
            SPK_K, shape=(M, K)), S)

    # ---- dense family -----------------------------------------------------
    cases['binary_densemv'] = mk(
        lambda on: be.binary_densemv(u(WD, S, on), SPK_K, transpose=False),
        S)
    cases['binary_densemm'] = mk(
        lambda on: be.binary_densemm(u(WD, S, on), SPKM_K, transpose=False),
        S)
    cases['update_dense_on_binary_pre'] = mk(
        lambda on: be.update_dense_on_binary_pre(
            u(WD, S, on), SPK_M, u(VK, S, on)), S)
    cases['update_dense_on_binary_post'] = mk(
        lambda on: be.update_dense_on_binary_post(
            u(WD, S, on), u(VM, S, on), SPK_K), S)

    # ---- fcn family -------------------------------------------------------
    cases['binary_fcnmv'] = mk(
        lambda on: be.binary_fcnmv(u(WELL, S, on), ELL, SPK_K,
                                   shape=(M, K), transpose=False), S)
    cases['binary_fcnmm'] = mk(
        lambda on: be.binary_fcnmm(u(WELL, S, on), ELL, SPKM_K,
                                   shape=(M, K), transpose=False), S)
    cases['fcnmv'] = mk(
        lambda on: be.fcnmv(u(WELL, S, on), ELL, u(VK, MV, on),
                            shape=(M, K), transpose=False), S * MV)
    cases['fcnmm'] = mk(
        lambda on: be.fcnmm(u(WELL, S, on), ELL, u(BK, MV, on),
                            shape=(M, K), transpose=False), S * MV)
    cases['fcnmv_dt2t'] = mk(
        lambda on: be.fcnmv_dt2t(u(VM, MV, on), u(WELL, S, on), ELL,
                                 shape=(M, K)), S * MV)
    cases['fcnmm_dt2t'] = mk(
        lambda on: be.fcnmm_dt2t(u(jnp.stack([VM, VM], 1), MV, on),
                                 u(WELL, S, on), ELL, shape=(M, K)),
        S * MV)
    cases['update_fixed_post_conn_on_binary_pre'] = mk(
        lambda on: be.update_fixed_post_conn_on_binary_pre(
            u(WELL, S, on), ELL, SPK_M, u(VK, S, on)), S)
    cases['update_fixed_pre_conn_on_binary_post'] = mk(
        lambda on: be.update_fixed_pre_conn_on_binary_post(
            u(WELL, S, on), ELL, u(VK, S, on), SPK_M), S)

    # ---- jitc families ----------------------------------------------------
    for t, params in (('s', (1.5,)), ('n', (0.5, 1.5)), ('u', (0.2, 1.7))):
        dense_fn = getattr(be, f'jit{t}')
        mv_fn = getattr(be, f'jit{t}mv')
        mm_fn = getattr(be, f'jit{t}mm')
        bmv_fn = getattr(be, f'binary_jit{t}mv')
        bmm_fn = getattr(be, f'binary_jit{t}mm')
        dt_fn = getattr(be, f'jit{t}mv_dt2t')

        def c_dense(on, fn=dense_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3, 42,
                      shape=(M, K))

        def c_mv(on, fn=mv_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3,
                      u(VK, MV, on), 42, shape=(M, K))

        def c_mm(on, fn=mm_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3,
                      u(BK, MV, on), 42, shape=(M, K))

        def c_bmv(on, fn=bmv_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3,
                      SPK_K, 42, shape=(M, K))

        def c_bmm(on, fn=bmm_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3,
                      SPKM_K, 42, shape=(M, K))

        def c_dt(on, fn=dt_fn, ps=params):
            return fn(*[u(jnp.float32(p), S, on) for p in ps], 0.3,
                      u(VM, MV, on), 42, shape=(M, K))

        cases[f'jit{t}'] = mk(c_dense, S)
        cases[f'jit{t}mv'] = mk(c_mv, S * MV)
        cases[f'jit{t}mm'] = mk(c_mm, S * MV)
        cases[f'binary_jit{t}mv'] = mk(c_bmv, S)
        cases[f'binary_jit{t}mm'] = mk(c_bmm, S)
        cases[f'jit{t}mv_dt2t'] = mk(c_dt, S * MV)

    return cases


_CASES = None


def _cases():
    global _CASES
    if _CASES is None:
        _CASES = _case_table()
    return _CASES


def _case_names():
    # the table builds lazily (imports brainevent_tpu), but names are static
    return [
        'binary_csrmv', 'binary_csrmm', 'csrmv', 'csrmm', 'csrmv_dt2t',
        'csrmm_dt2t', 'update_csr_on_binary_pre', 'update_csr_on_binary_post',
        'csr_slice_rows', 'binary_csrmv_indexed',
        'binary_densemv', 'binary_densemm', 'update_dense_on_binary_pre',
        'update_dense_on_binary_post',
        'binary_fcnmv', 'binary_fcnmm', 'fcnmv', 'fcnmm', 'fcnmv_dt2t',
        'fcnmm_dt2t', 'update_fixed_post_conn_on_binary_pre',
        'update_fixed_pre_conn_on_binary_post',
    ] + [f'{p}jit{t}{s}' for t in 'snu'
         for p, s in (('', ''), ('', 'mv'), ('', 'mm'), ('binary_', 'mv'),
                      ('binary_', 'mm'), ('', 'mv_dt2t'))]


@pytest.mark.parametrize('name', _case_names())
def test_unit_law(name):
    fn, expect = _cases()[name]
    out = fn(True)
    assert isinstance(out, bu.Quantity), f'{name} dropped its unit'
    assert out.unit == expect, f'{name}: {out.unit} != {expect}'


@pytest.mark.parametrize('name', _case_names())
def test_plain_inputs_stay_plain_and_match_mantissa(name):
    fn, _ = _cases()[name]
    plain = fn(False)
    assert not isinstance(plain, bu.Quantity), f'{name} invented a unit'
    out = fn(True)
    np.testing.assert_allclose(np.asarray(out.mantissa), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)
