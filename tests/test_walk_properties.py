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

"""Property-based tests for the JITC walk engine's invariants
(hypothesis over seeds/shapes/probabilities; ROADMAP quality item).

The invariants ARE the data contract: products must agree with the
materialized matrix for any (seed, shape, prob), structure must be a pure
function of the stream keys, and the count/fill pair must round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from brainevent_tpu import jitc


@pytest.fixture(scope='module', autouse=True)
def _fresh_compile_state():
    """Drop every cached executable before this module runs.

    The hypothesis sweeps here compile many small programs; appended to
    the full suite's compile load, the XLA CPU JIT has been observed to
    segfault inside ``backend_compile_and_load`` (it never fails with
    the module run in isolation). Clearing the caches at the module
    boundary keeps the process under the edge.
    """
    jax.clear_caches()
    yield

# shapes/probs drawn from FIXED pools so each test reuses a handful of
# compiled programs across all hypothesis examples (fresh shapes would
# recompile per example and blow the suite budget)
SHAPES = st.sampled_from([(8, 12), (17, 23), (32, 40), (1, 50), (40, 1)])
SEEDS = st.integers(0, 2**31 - 1)
PROBS = st.sampled_from([0.05, 0.2, 0.5, 0.9])
HSET = dict(max_examples=12, deadline=None)


class TestWalkProperties:
    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=PROBS, corder=st.booleans())
    def test_mv_agrees_with_todense(self, shape, seed, prob, corder):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=shape[1]).astype(np.float32))
        M = np.asarray(jitc.jits(1.5, prob, seed, shape=shape,
                                 corder=corder))
        y = np.asarray(jitc.jitsmv(1.5, prob, v, seed, shape=shape,
                                   corder=corder))
        np.testing.assert_allclose(y, M @ np.asarray(v),
                                   rtol=1e-4, atol=1e-4)

    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=PROBS)
    def test_structure_deterministic_and_dtype_free(self, shape, seed, prob):
        a = np.asarray(jitc.jits(1.0, prob, seed, shape=shape, corder=True))
        b = np.asarray(jitc.jits(jnp.float32(2.0), prob, seed, shape=shape,
                                 corder=True))
        np.testing.assert_array_equal(a != 0, b != 0)   # weight-free
        c = np.asarray(jitc.jits(1.0, prob, seed, shape=shape, corder=True))
        np.testing.assert_array_equal(a, c)             # deterministic

    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=PROBS)
    def test_seed_sensitivity(self, shape, seed, prob):
        a = np.asarray(jitc.jits(1.0, prob, seed, shape=shape, corder=True))
        b = np.asarray(jitc.jits(1.0, prob, (seed + 1) % 2**31, shape=shape,
                                 corder=True))
        if shape[0] * shape[1] >= 200 and 0.1 < prob < 0.9:
            assert (a != b).any()   # different seed -> different matrix

    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=PROBS)
    def test_count_fill_roundtrip(self, shape, seed, prob):
        from brainevent_tpu.jitc import jits_to_csr
        M = np.asarray(jitc.jits(1.5, prob, seed, shape=shape, corder=True))
        A = jits_to_csr(1.5, prob, seed, shape=shape)
        data, indices, indptr = A.data, A.indices, A.indptr
        dense = np.zeros(shape, np.float32)
        indptr = np.asarray(indptr)
        for r in range(shape[0]):
            cols = np.asarray(indices[indptr[r]:indptr[r + 1]])
            assert (np.diff(cols) > 0).all()   # column-sorted, no dups
            dense[r, cols] = np.asarray(data[indptr[r]:indptr[r + 1]])
        np.testing.assert_allclose(dense, M, rtol=1e-5, atol=1e-6)

    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=PROBS, corder=st.booleans())
    def test_binary_is_gated_float(self, shape, seed, prob, corder):
        rng = np.random.default_rng(1)
        spk = rng.random(shape[1]) < 0.4
        M = np.asarray(jitc.jits(1.5, prob, seed, shape=shape,
                                 corder=corder))
        y = np.asarray(jitc.binary_jitsmv(1.5, prob, jnp.asarray(spk), seed,
                                          shape=shape, corder=corder))
        np.testing.assert_allclose(y, M @ spk.astype(np.float32),
                                   rtol=1e-4, atol=1e-4)

    @settings(**HSET)
    @given(shape=SHAPES, seed=SEEDS, prob=st.sampled_from([0.05, 0.2, 0.5]))
    def test_normal_structure_matches_scalar_structure(self, shape, seed,
                                                       prob):
        # all three weight laws share one structure sampler: the scalar and
        # normal families must place nonzeros at identical positions
        a = np.asarray(jitc.jits(1.0, prob, seed, shape=shape, corder=True))
        b = np.asarray(jitc.jitn(3.0, 0.0, prob, seed, shape=shape,
                                 corder=True))
        np.testing.assert_array_equal(a != 0, b != 0)


class TestRowOffset:
    """``walk_setup(row0=k)`` must produce exactly the streams of global
    rows ``[k, k+n)`` — the partition-invariance contract behind
    ``sharded_jitmv``."""

    def test_setup_slice_equivalence(self):
        from brainevent_tpu.jitc import engine
        full = engine.walk_setup(7, 20, 32, 100, 32, 25)
        part = engine.walk_setup(7, 20, 8, 100, 32, 25, row0=16)
        for a, b in zip(full, part):
            if getattr(a, 'ndim', 0) == 3:
                np.testing.assert_array_equal(np.asarray(a)[16:24],
                                              np.asarray(b))

    def test_matvec_row_partition_sums(self, rng):
        # corder=True: concatenating two half-walks equals the full walk
        from brainevent_tpu.jitc import engine
        from brainevent_tpu.jitc.normal import _normal_weight
        params = (jnp.asarray([0.5]), jnp.asarray([0.2]))
        wfn = lambda s, r, c: _normal_weight(params, s, r, c)
        v = jnp.asarray(rng.normal(size=60), jnp.float32)
        full = engine.walk_matvec(wfn, 7, 20, v, 48, corder=True,
                                  logical_cols=60)
        lo = engine.walk_matvec(wfn, 7, 20, v, 24, corder=True,
                                logical_cols=60, row0=0)
        hi = engine.walk_matvec(wfn, 7, 20, v, 24, corder=True,
                                logical_cols=60, row0=24)
        np.testing.assert_allclose(np.asarray(full),
                                   np.concatenate([lo, hi]),
                                   rtol=1e-6)

    def test_scatter_row_partition_sums(self, rng):
        # corder=False: partial scatters over row halves sum to the full
        from brainevent_tpu.jitc import engine
        from brainevent_tpu.jitc.scalar import _scalar_weight
        params = (jnp.asarray([1.5]),)
        wfn = lambda s, r, c: _scalar_weight(params, s, r, c)
        v = jnp.asarray(rng.normal(size=48), jnp.float32)
        full = engine.walk_matvec(wfn, 7, 20, v, 60, corder=False,
                                  logical_cols=60)
        lo = engine.walk_matvec(wfn, 7, 20, v[:24], 60, corder=False,
                                logical_cols=60, row0=0)
        hi = engine.walk_matvec(wfn, 7, 20, v[24:], 60, corder=False,
                                logical_cols=60, row0=24)
        np.testing.assert_allclose(np.asarray(full),
                                   np.asarray(lo) + np.asarray(hi),
                                   rtol=1e-5, atol=1e-5)
