# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""JITCNet: the implicit-connectivity EI acceptance workload
(BASELINE.json "80k-neuron net on JITCNormalR/JITCUniformR").
Connectivity is regenerated in-kernel; a step must match a dense-matrix
oracle exactly up to f32 summation order."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainevent_tpu.models import JITCNet


@pytest.mark.parametrize('law', ['normal', 'uniform', 'scalar'])
def test_step_matches_dense_oracle(law):
    """One propagation step == spikes @ todense() of the same matrices."""
    net = JITCNet(scale=0.05, weight_law=law)  # 200 neurons
    state = net.init_state()
    # seed membranes just below/above threshold so ~40% cross this step
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.uniform(-52.0, -49.5, net.num), jnp.float32)
    state = state._replace(neurons=state.neurons._replace(v=v0))
    s1 = net.step(state, 0.0, inp=80.0)
    De = np.asarray(net.conn_e.todense())
    Di = np.asarray(net.conn_i.todense())
    p = net.params
    g_e = np.asarray(state.g_e) * math.exp(-net.dt / net.tau_e)
    g_i = np.asarray(state.g_i) * math.exp(-net.dt / net.tau_i)
    v = np.asarray(state.neurons.v)
    cur = g_e * (net.e_e - v) + g_i * (net.e_i - v) + 80.0
    refr = (0.0 - np.asarray(state.neurons.t_last)) < p.tau_ref
    v2 = np.where(refr, v, v + (p.v_rest - v + p.r * cur) * (net.dt / p.tau))
    spk = v2 >= p.v_th
    assert spk.sum() >= 10, 'oracle test needs a real spike set'
    inc_e = spk[:net.n_exc].astype(np.float32) @ De
    inc_i = spk[net.n_exc:].astype(np.float32) @ Di
    np.testing.assert_allclose(np.asarray(s1.g_e), g_e + inc_e,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.g_i), g_i + inc_i,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s1.spike_count), spk)


def test_sustained_regime():
    """A jitted multi-step run lands in a biological firing band."""
    net = JITCNet(scale=0.1, weight_law='normal')  # 400 neurons
    final = jax.jit(lambda s: net.run(300, state=s))(net.init_state())
    rate = float(net.firing_rate_hz(final, 300))
    assert 1.0 < rate < 200.0, f'rate {rate} Hz outside regime band'


def test_cuba_variant_runs():
    net = JITCNet(scale=0.05, weight_law='scalar', coba=False, w_e=0.3,
                  w_i=1.0)
    final = jax.jit(lambda s: net.run(100, state=s))(net.init_state())
    assert int(final.spike_count.sum()) >= 0  # completes, finite
    assert bool(jnp.all(jnp.isfinite(final.neurons.v)))


def test_no_weight_storage():
    """The implicit contract: model memory excludes any O(n^2) or
    O(nnz) connectivity buffer (plan streams are O(n * L))."""
    net = JITCNet(scale=0.25)  # 1000 neurons
    leaves = jax.tree.leaves((net.conn_e.data, net.conn_i.data))
    assert all(np.asarray(l).size <= 1 for l in leaves)
    n_stream_words = sum(np.asarray(s).size
                         for s in (net.plan_e.setup + net.plan_i.setup))
    assert n_stream_words < 4 * net.num * 128  # O(n), not O(n^2)


def test_bad_weight_law():
    with pytest.raises(ValueError, match='weight_law'):
        JITCNet(scale=0.05, weight_law='lognormal')
