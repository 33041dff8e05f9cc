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

"""Conformance and property tests for the runtime MXU pair gather
(``ops/pair_gather.py``), the kernel behind the plasticity/dt2t family's
pallas backends (VERDICT r3 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainevent_tpu.ops.pair_gather import pair_gather_product


def _ref(rows, cols, s, x):
    out = jnp.ones(rows.shape if rows is not None else cols.shape,
                   jnp.float32)
    if s is not None:
        out = out * jnp.where(rows >= 0, s.astype(jnp.float32)[
            jnp.clip(rows, 0)], 0.0)
    if x is not None:
        out = out * jnp.where(cols >= 0, x.astype(jnp.float32)[
            jnp.clip(cols, 0)], 0.0)
    return out


@pytest.mark.parametrize('nse', [1, 100, 1024, 1025, 8192, 10000])
def test_pair_both_sides_exact(nse):
    rng = np.random.default_rng(nse)
    m, k = 300, 500
    rows = jnp.asarray(rng.integers(0, m, nse), jnp.int32)
    cols = jnp.asarray(rng.integers(0, k, nse), jnp.int32)
    s = jnp.asarray(rng.normal(size=m), jnp.float32)
    x = jnp.asarray(rng.normal(size=k), jnp.float32)
    out = pair_gather_product(rows, cols, s, x)
    assert out is not None and out.shape == (nse,)
    assert jnp.array_equal(out, _ref(rows, cols, s, x))


@pytest.mark.parametrize('side', ['row', 'col'])
def test_single_side(side):
    rng = np.random.default_rng(0)
    n, nse = 257, 3000
    ids = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    if side == 'row':
        out = pair_gather_product(ids, None, v, None)
        ref = _ref(ids, None, v, None)
    else:
        out = pair_gather_product(None, ids, None, v)
        ref = _ref(None, ids, None, v)
    assert jnp.array_equal(out, ref)


def test_sentinel_ids_are_exact_zero():
    rng = np.random.default_rng(1)
    n, nse = 100, 500
    rows = np.asarray(rng.integers(0, n, nse), np.int32)
    rows[::7] = -1
    cols = np.asarray(rng.integers(0, n, nse), np.int32)
    cols[::11] = -1
    s = jnp.asarray(rng.normal(size=n), jnp.float32)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    out = pair_gather_product(jnp.asarray(rows), jnp.asarray(cols), s, x)
    ref = _ref(jnp.asarray(rows), jnp.asarray(cols), s, x)
    assert jnp.array_equal(out, ref)
    assert bool(jnp.all(out[::7] == 0.0)) and bool(jnp.all(out[::11] == 0.0))


def test_event_gate_single_pass_exact():
    # 0/1 gates are exact in one bf16 pass (the plasticity fast path)
    rng = np.random.default_rng(2)
    n, nse = 640, 4096
    rows = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    cols = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    gate = jnp.asarray((rng.random(n) < 0.1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    out = pair_gather_product(rows, cols, gate, x, s_passes=1, x_passes=3)
    assert jnp.array_equal(out, _ref(rows, cols, gate, x))


def test_traced_ids_under_jit():
    rng = np.random.default_rng(3)
    n, nse = 200, 1000
    rows = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    cols = jnp.asarray(rng.integers(0, n, nse), jnp.int32)
    s = jnp.asarray(rng.normal(size=n), jnp.float32)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)

    @jax.jit
    def f(r, c, s_, x_):
        return pair_gather_product(r, c, s_, x_)

    assert jnp.array_equal(f(rows, cols, s, x), _ref(rows, cols, s, x))


def test_envelope_fallbacks():
    # f64 operand -> None; oversized operands -> None
    rows = jnp.zeros(10, jnp.int32)
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    try:
        s64 = jnp.zeros(8, jnp.float64)
        assert pair_gather_product(rows, None, s64, None) is None
    finally:
        jax.config.update('jax_enable_x64', old)
    big = jnp.zeros(2049 * 128, jnp.float32)
    assert pair_gather_product(rows, rows, big, big) is None
    with pytest.raises(ValueError):
        pair_gather_product(None, None, None, None)
    with pytest.raises(ValueError):
        pair_gather_product(rows, jnp.zeros(11, jnp.int32),
                            jnp.zeros(8, jnp.float32),
                            jnp.zeros(8, jnp.float32))


def test_empty_nse():
    out = pair_gather_product(jnp.zeros(0, jnp.int32), None,
                              jnp.zeros(8, jnp.float32), None)
    assert out.shape == (0,)
