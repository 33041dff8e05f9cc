# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Alias-registry policy and warning behavior.

The backend registry is honest about aliases: a ``pallas`` registration
that runs the ``jax_raw`` kernel carries ``alias_of`` + a ``note`` citing
a measurement or design rationale (``ops/core.py:76-84``), and explicitly
selecting an aliased backend warns once.  These tests enforce the policy
repo-wide so a future registration cannot silently masquerade as kernel
coverage (VERDICT r2: aliases must not be mistaken for coverage)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be

_PLATFORMS = ('cpu', 'tpu')


def _all_entries():
    out = []
    for name, prim in sorted(be.get_registry().items()):
        for platform in _PLATFORMS:
            for info in prim.backend_info(platform):
                out.append((name, platform, info))
    return out


def test_every_alias_has_note():
    """Policy: every alias cites a measurement or design rationale."""
    bad = [(n, p, i['backend']) for n, p, i in _all_entries()
           if i['alias_of'] is not None and not (i['note'] or '').strip()]
    assert not bad, f'aliases without rationale: {bad}'


def test_alias_targets_exist():
    """An alias must point at a registered backend of the same platform."""
    reg = be.get_registry()
    bad = []
    for name, platform, info in _all_entries():
        if info['alias_of'] is not None:
            backends = reg[name].available_backends(platform)
            if info['alias_of'] not in backends:
                bad.append((name, platform, info['backend'],
                            info['alias_of']))
    assert not bad, f'aliases pointing at unregistered backends: {bad}'


def test_real_backends_excludes_aliases():
    for name, prim in be.get_registry().items():
        for platform in _PLATFORMS:
            aliased = {i['backend'] for i in prim.backend_info(platform)
                       if i['alias_of'] is not None}
            real = set(prim.real_backends(platform))
            assert not (aliased & real), (name, platform, aliased & real)


def test_jitc_mv_pallas_is_real_now():
    """Round-3 regression guard: the slot-scan kernels replaced the mv
    aliases — they must never silently revert to aliases."""
    for t in 'snu':
        for prefix in ('', 'binary_'):
            prim = be.get_registry()[f'{prefix}jit{t}mv']
            infos = {i['backend']: i for i in prim.backend_info('tpu')}
            assert infos['pallas']['alias_of'] is None, prim.name


def test_explicit_alias_selection_warns_once():
    """Explicitly requesting an aliased backend warns with the note text,
    exactly once per (primitive, platform, backend) — deduplicated."""
    from brainevent_tpu.ops import core
    prim = be.get_registry()['binary_csrmm']  # pallas aliases jax_raw
    platform = jax.default_backend()
    infos = {i['backend']: i for i in prim.backend_info(platform)}
    if infos.get('pallas', {}).get('alias_of') is None:
        pytest.skip('binary_csrmm pallas is no longer an alias')
    # odd shape no other test compiles: the warning fires at lowering
    # time, so a jit-cache hit from another test would silence it
    rng = np.random.default_rng(3)
    m, k = 37, 53
    mask = rng.random((m, k)) < 0.2
    indptr = jnp.asarray(
        np.concatenate([[0], np.cumsum(mask.sum(1))]).astype(np.int32))
    indices = jnp.asarray(np.concatenate(
        [np.flatnonzero(r) for r in mask]).astype(np.int32))
    data = jnp.asarray(rng.normal(size=int(mask.sum())).astype(np.float32))
    B = jnp.asarray(rng.random((k, 4)) < 0.3)

    class _Cfg:
        args = (data, indices, indptr, B)
        kwargs = {'shape': (m, k), 'transpose': False}
    cfg = _Cfg()
    key = (prim.name, platform, 'pallas')
    core._ALIAS_WARNED.discard(key)   # order-independence
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        jax.block_until_ready(
            prim._call_fn(*cfg.args, backend='pallas', **cfg.kwargs))
    texts = [str(x.message) for x in w if 'alias' in str(x.message)]
    assert len(texts) == 1, texts
    assert (infos['pallas']['note'] or '')[:30] in texts[0]
    assert key in core._ALIAS_WARNED
    # second selection: no new warning (deduplicated)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter('always')
        jax.block_until_ready(
            jax.jit(lambda *a: prim._call_fn(
                *a, backend='pallas', **cfg.kwargs))(*cfg.args))
    assert not [x for x in w2 if 'alias' in str(x.message)]
