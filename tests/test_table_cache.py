# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""mxu6 partitioned-table disk cache (round 5).

The 400k table build + slot encode is ~2 min of host NumPy per process;
the cache keys on the connectivity BYTES + every layout knob, so a hit
is byte-identical by construction and any change to the inputs misses.
"""

import os

import numpy as np
import pytest

import brainevent_tpu.models.pallas_sim as ps
from brainevent_tpu.models.networks import EINet


@pytest.fixture
def small_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(ps, '_TABLE_CACHE_MIN_ELEMS', 0)
    monkeypatch.setenv('BRAINEVENT_TABLE_CACHE', str(tmp_path))
    return tmp_path


def _cmp(a, b):
    for x, y in zip(a, b):
        if isinstance(x, np.ndarray):
            np.testing.assert_array_equal(x, y)
        elif isinstance(x, dict):
            assert x is not None and y is not None
            assert set(x) == set(y)
            for k in x:
                np.testing.assert_array_equal(np.asarray(x[k]),
                                              np.asarray(y[k]))
        else:
            assert x == y, (x, y)


def test_roundtrip_bit_identical(small_cache, monkeypatch):
    net = EINet(scale=1.0, seed=42)
    fresh = ps._mxu6_layout(net, 384, 4, 'block', radix=3)
    names = os.listdir(small_cache)
    # exactly one FINAL artifact (no orphaned np.savez '.tmp*.npz' files —
    # the round-5 naming bug this test pinned down)
    assert len(names) == 1 and names[0].endswith('.npz'), names
    assert '.tmp' not in names[0], names

    # the second call must LOAD, not rebuild: poison the builders
    def boom(*a, **kw):
        raise AssertionError('cache miss: partitioner re-ran')
    monkeypatch.setattr(ps, '_partition_table_cg', boom)
    monkeypatch.setattr(ps, '_partition_table', boom)
    cached = ps._mxu6_layout(net, 384, 4, 'block', radix=3)
    _cmp(fresh, cached)


def test_key_covers_knobs(small_cache):
    net = EINet(scale=1.0, seed=42)
    ps._mxu6_layout(net, 384, 4, 'block', radix=3)
    ps._mxu6_layout(net, 12, 4, 'block', radix=3)     # different rpb
    ps._mxu6_layout(net, 384, 2, 'block', radix=3)    # different group
    assert len(os.listdir(small_cache)) == 3


def test_key_covers_connectivity(small_cache):
    ps._mxu6_layout(EINet(scale=1.0, seed=42), 384, 4, 'block', radix=3)
    ps._mxu6_layout(EINet(scale=1.0, seed=43), 384, 4, 'block', radix=3)
    assert len(os.listdir(small_cache)) == 2


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setattr(ps, '_TABLE_CACHE_MIN_ELEMS', 0)
    monkeypatch.setenv('BRAINEVENT_TABLE_CACHE', '0')
    net = EINet(scale=1.0, seed=42)
    ps._mxu6_layout(net, 384, 4, 'block', radix=3)
    assert ps._table_cache_dir() is None


def test_small_nets_skip_cache(small_cache, monkeypatch):
    monkeypatch.setattr(ps, '_TABLE_CACHE_MIN_ELEMS', 10**12)
    net = EINet(scale=1.0, seed=42)
    ps._mxu6_layout(net, 384, 4, 'block', radix=3)
    assert len(os.listdir(small_cache)) == 0
