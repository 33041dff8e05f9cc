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

"""Round-4 feature tests: mxu6 radix packing, the tiered event-route
tail, sort-based compaction, the row-id cumsum formulation, and the new
config knobs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be
from brainevent_tpu import config as cfg


class TestEncodeSlotsRadix:
    """The radix remap must be a bijection on (block, lane) per class —
    decode(encode(t)) recovers the target for every radix."""

    @pytest.mark.parametrize('radix', [3, 6, 12])
    @pytest.mark.parametrize('rpb', [12, 24, 384])
    def test_roundtrip(self, radix, rpb):
        from brainevent_tpu.models.pallas_sim import _encode_slots
        if rpb % radix:
            pytest.skip('radix must divide rpb')
        r3p = rpb // 3
        ch_n = radix // 3
        rh = rpb // radix
        rng = np.random.default_rng(radix * 100 + rpb)
        n_rows, width = 64, 40
        n_exc = 40
        # partition-local targets in [0, rpb*128)
        t = rng.integers(0, rpb * 128, (n_rows, width)).astype(np.int64)
        t[rng.random((n_rows, width)) < 0.1] = -1
        enc = _encode_slots(t, r3p, n_exc, radix=radix)
        assert np.all(enc[t < 0] == -1)
        e = enc[t >= 0].astype(np.int64)
        lane = e & 127
        rest = e >> 7
        fld = rest & 3
        col = rest >> 2
        is_inh = (np.broadcast_to(np.arange(n_rows)[:, None],
                                  t.shape)[t >= 0] >= n_exc)
        colc = col - r3p * is_inh
        ch = colc // rh
        c = colc % rh
        q = fld * ch_n + ch
        hi = q * rh + c
        back = (hi << 7) | lane
        np.testing.assert_array_equal(back, t[t >= 0])
        assert np.all(col < 2 * r3p) and np.all(fld < 3)

    @pytest.mark.parametrize('num,rpb,expect', [
        (400000, 384, 12), (200000, 384, 12),
        (40000, 384, 3),        # clamped rpb=315: only 3 divides
        (4000, 12, 12), (4000, 6, 6), (4000, 9, 3),
    ])
    def test_auto_radix(self, num, rpb, expect):
        from brainevent_tpu.models.pallas_sim import _auto_radix
        assert _auto_radix(num, rpb) == expect

    def test_invalid_radix_raises(self):
        from brainevent_tpu.models.pallas_sim import _encode_slots
        with pytest.raises(ValueError):
            _encode_slots(np.zeros((4, 4), np.int64), 128, 2, radix=5)


class TestCompactIndicesSort:
    """Sort-based compaction must match the cumsum+scatter contract."""

    @pytest.mark.parametrize('n', [1, 7, 128, 1000, 4096])
    @pytest.mark.parametrize('rate', [0.0, 0.05, 1.0])
    def test_matches_nonzero(self, n, rate):
        from brainevent_tpu.events.compact_ops import _compact_indices
        rng = np.random.default_rng(n)
        mask = jnp.asarray(rng.random(n) < rate)
        ids = jnp.arange(n, dtype=jnp.int32)
        out, count = _compact_indices(mask, ids)
        ref = np.flatnonzero(np.asarray(mask))
        assert int(count[0]) == ref.size
        np.testing.assert_array_equal(np.asarray(out[:ref.size]), ref)
        np.testing.assert_array_equal(np.asarray(out[ref.size:]), 0)


class TestRowIdsCumsum:
    @pytest.mark.parametrize('m,pattern', [
        (1, 'uniform'), (7, 'uniform'), (40, 'empty_rows'),
        (16, 'leading_empty'), (16, 'trailing_empty'), (5, 'all_empty'),
    ])
    def test_matches_repeat(self, m, pattern):
        from brainevent_tpu.csr._common import row_ids_from_indptr
        rng = np.random.default_rng(m)
        counts = rng.integers(1, 6, m)
        if pattern == 'empty_rows':
            counts[::3] = 0
        elif pattern == 'leading_empty':
            counts[:4] = 0
        elif pattern == 'trailing_empty':
            counts[-4:] = 0
        elif pattern == 'all_empty':
            counts[:] = 0
        indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]),
                             jnp.int32)
        nse = int(counts.sum())
        expect = np.repeat(np.arange(m), counts)
        got = row_ids_from_indptr(indptr, nse)
        np.testing.assert_array_equal(np.asarray(got), expect)
        assert got.dtype == indptr.dtype


class TestTieredEventTail:
    """The event route's lax.switch tiers must be exact at every live-row
    count (prefix slicing is exact only because compacted live rows
    lead)."""

    @pytest.mark.parametrize('rate', [0.0, 0.002, 0.02, 0.2])
    def test_event_product_matches_full(self, rate):
        from brainevent_tpu.jitc import JITCNormalR
        rng = np.random.default_rng(int(rate * 1000))
        n = 600
        m = JITCNormalR((0.5, 0.1, 0.05, 7), shape=(n, n), corder=True)
        plan = m.build_walk_plan()
        plan.event_cap = 128
        spk = be.BinaryArray(jnp.asarray(rng.random(n) < rate))
        fast = spk @ plan
        full = jnp.asarray(np.asarray(spk.value, np.float32)) @ m.todense()
        np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                                   rtol=2e-4, atol=2e-4)


class TestNewConfigKnobs:
    def test_auto_mxu_plan_validation(self):
        before = cfg.get_auto_mxu_plan()
        try:
            for mode in ('auto', True, False):
                cfg.set_auto_mxu_plan(mode)
                assert cfg.get_auto_mxu_plan() == mode
            with pytest.raises(ValueError):
                cfg.set_auto_mxu_plan('yes')
        finally:
            cfg.set_auto_mxu_plan(before)

    def test_mxu_plan_min_nse_validation(self):
        before = cfg.get_mxu_plan_min_nse()
        try:
            cfg.set_mxu_plan_min_nse(123)
            assert cfg.get_mxu_plan_min_nse() == 123
            with pytest.raises(ValueError):
                cfg.set_mxu_plan_min_nse(-1)
        finally:
            cfg.set_mxu_plan_min_nse(before)


class TestShardedMegaLayout:
    def test_rejects_overdegree(self):
        from brainevent_tpu.parallel.mega import MegaScatterLayout
        # 300 excitatory sources all targeting neuron 0 -> per-class
        # in-degree > 255 breaks the 8-bit packed-field exactness
        conn = np.zeros((300, 1), np.int32)
        with pytest.raises(ValueError):
            MegaScatterLayout(conn, 300, 384)

    def test_rejects_unaligned_num(self):
        from brainevent_tpu.parallel.mega import MegaScatterLayout
        with pytest.raises(ValueError):
            MegaScatterLayout(np.zeros((100, 4), np.int32), 80, 100)


class TestDenseMMRoute:
    """Cached-dense mat-mat crossover (config.set_dense_mm_max_bytes)."""

    def _mk(self, rng, m=80, k=96):
        mask = rng.random((m, k)) < 0.2
        rows, cols = np.nonzero(mask)
        counts = np.bincount(rows, minlength=m)
        indptr = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]),
                             jnp.int32)
        w = jnp.asarray(rng.normal(size=rows.size), jnp.float32)
        return be.CSR((w, jnp.asarray(cols, jnp.int32), indptr),
                      shape=(m, k))

    @pytest.mark.parametrize('direction', ['AB', 'xA', 'cscAB', 'cscxA'])
    def test_matches_sparse_route(self, direction):
        rng = np.random.default_rng(3)
        A = self._mk(rng)
        Bm = jnp.asarray(rng.normal(size=(A.shape[1], 5)), jnp.float32)
        X = jnp.asarray(rng.normal(size=(5, A.shape[0])), jnp.float32)
        before_mode = cfg.get_auto_mxu_plan()
        before_nse = cfg.get_mxu_plan_min_nse()
        C = A.tocsc()
        try:
            def go():
                if direction == 'AB':
                    return A @ Bm
                if direction == 'xA':
                    return X @ A
                if direction == 'cscAB':
                    return C @ Bm
                return X @ C
            ref = go()                      # sparse route (gates off)
            cfg.set_auto_mxu_plan(True)     # force on any platform
            cfg.set_mxu_plan_min_nse(1)
            fast = go()
            assert getattr(A if 'csc' not in direction else C,
                           '_mxu_dense', None) is not None
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
        finally:
            cfg.set_auto_mxu_plan(before_mode)
            cfg.set_mxu_plan_min_nse(before_nse)

    def test_grad_wrt_operand(self):
        rng = np.random.default_rng(4)
        A = self._mk(rng)
        Bm = jnp.asarray(rng.normal(size=(A.shape[1], 4)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(A.shape[0], 4)), jnp.float32)
        before_mode = cfg.get_auto_mxu_plan()
        before_nse = cfg.get_mxu_plan_min_nse()
        try:
            g_ref = jax.grad(
                lambda b: jnp.vdot(A @ b, ct))(Bm)
            cfg.set_auto_mxu_plan(True)
            cfg.set_mxu_plan_min_nse(1)
            g_fast = jax.grad(lambda b: jnp.vdot(A @ b, ct))(Bm)
            np.testing.assert_allclose(np.asarray(g_fast),
                                       np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-4)
        finally:
            cfg.set_auto_mxu_plan(before_mode)
            cfg.set_mxu_plan_min_nse(before_nse)

    def test_budget_and_traced_gates(self):
        rng = np.random.default_rng(5)
        A = self._mk(rng)
        Bm = jnp.asarray(rng.normal(size=(A.shape[1], 4)), jnp.float32)
        before = cfg.get_dense_mm_max_bytes()
        before_mode = cfg.get_auto_mxu_plan()
        before_nse = cfg.get_mxu_plan_min_nse()
        try:
            cfg.set_auto_mxu_plan(True)
            cfg.set_mxu_plan_min_nse(1)
            cfg.set_dense_mm_max_bytes(8)      # too small
            _ = A @ Bm
            assert getattr(A, '_mxu_dense', None) is None
            with pytest.raises(ValueError):
                cfg.set_dense_mm_max_bytes(-1)
            cfg.set_dense_mm_max_bytes(1 << 30)
            # traced data -> None (exact AD on the primitive)
            def f(d):
                M = be.CSR((d, A.indices, A.indptr), shape=A.shape)
                assert M._mxu_matmat(Bm, csr_transpose=False) is None
                return M @ Bm
            ref = A @ Bm
            np.testing.assert_allclose(np.asarray(jax.jit(f)(A.data)),
                                       np.asarray(ref), rtol=1e-4,
                                       atol=1e-4)
        finally:
            cfg.set_dense_mm_max_bytes(before)
            cfg.set_auto_mxu_plan(before_mode)
            cfg.set_mxu_plan_min_nse(before_nse)


class TestFcnDenseMMRoute:
    @pytest.mark.parametrize('cls_dir', ['pre_AB', 'pre_xA',
                                         'post_AB', 'post_xA'])
    def test_matches_sparse_route(self, cls_dir):
        from brainevent_tpu.fcn.main import FixedNumPerPre, FixedNumPerPost
        rng = np.random.default_rng(6)
        n_pre, n_post, K = 60, 72, 5
        idx = jnp.asarray(rng.integers(0, n_post, (n_pre, K)), jnp.int32)
        d = jnp.asarray(rng.normal(size=(n_pre, K)), jnp.float32)
        if cls_dir.startswith('pre'):
            M = FixedNumPerPre((d, idx), shape=(n_pre, n_post))
        else:
            M = FixedNumPerPost((d, idx), shape=(n_post, n_pre))
        Bm = jnp.asarray(rng.normal(size=(M.shape[1], 4)), jnp.float32)
        X = jnp.asarray(rng.normal(size=(4, M.shape[0])), jnp.float32)
        go = (lambda: M @ Bm) if cls_dir.endswith('AB') else (lambda: X @ M)
        ref = go()
        before_mode = cfg.get_auto_mxu_plan()
        before_nse = cfg.get_mxu_plan_min_nse()
        try:
            cfg.set_auto_mxu_plan(True)
            cfg.set_mxu_plan_min_nse(1)
            fast = go()
            # direction-gated: dense only serves the unfavorable
            # (ell_transpose) direction — pre_xA and post_AB
            if cls_dir in ('pre_xA', 'post_AB'):
                assert getattr(M, '_mxu_dense', None) is not None
            else:
                assert getattr(M, '_mxu_dense', None) is None
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
        finally:
            cfg.set_auto_mxu_plan(before_mode)
            cfg.set_mxu_plan_min_nse(before_nse)
