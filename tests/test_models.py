# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Model + multi-chip sharding tests (the acceptance workloads end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brainevent_tpu.models import (
    EINet, LIFRefParams, LIFRefState, lifref_init, lifref_step,
    surrogate_spike,
)
from brainevent_tpu.parallel import ShardedEINet, neuron_mesh


class TestLIF:
    def test_resting_stays_at_rest(self):
        p = LIFRefParams()
        st = LIFRefState(v=jnp.full((4,), p.v_rest),
                         t_last=jnp.full((4,), -1e7))
        st2, spk = lifref_step(st, jnp.zeros(4), 0.0, 0.1, p)
        assert not bool(spk.any())
        np.testing.assert_allclose(st2.v, p.v_rest, atol=1e-6)

    def test_strong_input_spikes_and_resets(self):
        p = LIFRefParams()
        st = LIFRefState(v=jnp.full((2,), -50.5), t_last=jnp.full((2,), -1e7))
        st2, spk = lifref_step(st, jnp.full(2, 1000.0), 1.0, 0.1, p)
        assert bool(spk.all())
        np.testing.assert_allclose(st2.v, p.v_reset)
        np.testing.assert_allclose(st2.t_last, 1.0)

    def test_refractory_blocks_integration(self):
        p = LIFRefParams()
        st = LIFRefState(v=jnp.full((1,), p.v_reset),
                         t_last=jnp.zeros(1))  # just spiked at t=0
        st2, spk = lifref_step(st, jnp.full(1, 1000.0), 1.0, 0.1, p)
        assert not bool(spk.any())
        np.testing.assert_allclose(st2.v, p.v_reset)

    def test_surrogate_gradient(self):
        g = jax.grad(lambda x: surrogate_spike(x).sum())(jnp.zeros(3))
        assert (np.asarray(g) > 0).all()
        y = surrogate_spike(jnp.asarray([-1.0, 0.0, 1.0]))
        np.testing.assert_allclose(y, [0.0, 1.0, 1.0])


class TestEINet:
    @pytest.mark.parametrize('coba', [True, False])
    def test_firing_rate_regime(self, coba):
        net = EINet(scale=0.25, coba=coba)  # 1000 neurons
        state = jax.jit(lambda: net.run(3000))()
        rate = float(net.firing_rate_hz(state, 3000))
        # reference nets sit near 50 Hz; accept a broad plausible band
        assert 5.0 < rate < 200.0, f'firing rate {rate} Hz out of regime'

    def test_step_is_jittable_and_pure(self):
        net = EINet(scale=0.1, coba=True)
        s0 = net.init_state()
        step = jax.jit(lambda s, t: net.step(s, t))
        s1 = step(s0, 0.0)
        s1b = step(s0, 0.0)
        np.testing.assert_allclose(np.asarray(s1.neurons.v),
                                   np.asarray(s1b.neurons.v))

    def test_state_is_pytree(self):
        net = EINet(scale=0.1)
        s = net.init_state()
        leaves, treedef = jax.tree_util.tree_flatten(s)
        s2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert s2.neurons.v.shape == s.neurons.v.shape


class TestSharded:
    def test_sharded_matches_regime(self):
        mesh = neuron_mesh(8)
        net = ShardedEINet(mesh=mesh, num=1024, n_conn=32)
        state = jax.jit(lambda s: net.run(2000, state=s))(net.init_state())
        rate = float(state.spike_count.mean()) / (2000 * 0.1e-3)
        assert 1.0 < rate < 500.0

    def test_sharded_step_keeps_sharding(self):
        mesh = neuron_mesh(8)
        net = ShardedEINet(mesh=mesh, num=512, n_conn=16)
        state = net.init_state()
        out = jax.jit(net.step_fn())(state, 0.0)
        assert 'neurons' in str(out.v.sharding)

    def test_graft_entry(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'graft_entry', '/root/repo/__graft_entry__.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        mod.dryrun_multichip(8)


class TestShardedOps:
    def test_sharded_fcnmv_matches_single(self, rng):
        from brainevent_tpu.parallel import neuron_mesh, sharded_binary_fcnmv
        from brainevent_tpu.fcn import binary_fcnmv
        mesh = neuron_mesh(8)
        n_pre, n_post, n_conn = 256, 300, 8
        indices = jnp.asarray(rng.integers(0, n_post, (n_pre, n_conn)),
                              dtype=jnp.int32)
        w = jnp.asarray([0.5], jnp.float32)
        spk = jnp.asarray(rng.random(n_pre) < 0.1)
        want = binary_fcnmv(w, indices, spk, shape=(n_pre, n_post),
                            transpose=True)
        got = sharded_binary_fcnmv(w, indices, spk, mesh=mesh,
                                   shape=(n_pre, n_post))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_sharded_fcnmv_hetero_psum_scatter(self, rng):
        from brainevent_tpu.parallel import neuron_mesh, sharded_binary_fcnmv
        from brainevent_tpu.fcn import binary_fcnmv
        mesh = neuron_mesh(8)
        n_pre, n_post, n_conn = 256, 256, 8
        indices = jnp.asarray(rng.integers(0, n_post, (n_pre, n_conn)),
                              dtype=jnp.int32)
        w = jnp.asarray(rng.normal(size=(n_pre, n_conn)), dtype=jnp.float32)
        spk = jnp.asarray(rng.random(n_pre) < 0.1)
        want = binary_fcnmv(w, indices, spk, shape=(n_pre, n_post),
                            transpose=True)
        got = sharded_binary_fcnmv(w, indices, spk, mesh=mesh,
                                   shape=(n_pre, n_post),
                                   reduce='psum_scatter')
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_sharded_csrmv_matches_single(self, rng):
        from brainevent_tpu.parallel import neuron_mesh, sharded_binary_csrmv
        from brainevent_tpu.csr import binary_csrmv
        mesh = neuron_mesh(8)
        m, k, per_row = 256, 300, 4
        indices = jnp.asarray(rng.integers(0, k, m * per_row), dtype=jnp.int32)
        indptr = jnp.asarray(np.arange(m + 1) * per_row, dtype=jnp.int32)
        w = jnp.asarray(rng.normal(size=m * per_row), dtype=jnp.float32)
        spk = jnp.asarray(rng.random(m) < 0.1)
        want = binary_csrmv(w, indices, indptr, spk, shape=(m, k),
                            transpose=True)
        got = sharded_binary_csrmv(w, indices, indptr, spk, mesh=mesh,
                                   shape=(m, k))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


class TestPallasMegaKernel:
    def test_auto_strategy_crossover(self):
        # measured v5e crossover: mxu3 keeps the 4k headline, tuned
        # mxu6 takes over at >= 40k (BENCH_NOTES round-3 continuation)
        from brainevent_tpu.models.pallas_sim import _auto_strategy
        assert _auto_strategy(4_000) == 'mxu3'
        assert _auto_strategy(39_999) == 'mxu3'
        assert _auto_strategy(40_000) == 'mxu6'
        assert _auto_strategy(400_000) == 'mxu6'

    def test_matches_xla_loop(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.032, coba=True)  # 127 neurons (pads to 128)
        s0 = net.init_state()
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        v, tl, ge, gi, cnt = einet_pallas_sim(net, s0, 30)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref.neurons.v),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(cnt),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_cuba_variant(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.032, coba=False)
        s0 = net.init_state()
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    def test_mxu2_strategy_matches_xla_loop(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30, strategy='mxu2')
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref.neurons.v), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_mxu2_multi_round_burst_exact(self):
        # saturating drive: actives exceed cap -> multi-round compaction
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.064, seed=3)
        s0 = net.init_state(jax.random.PRNGKey(0))
        ref = jax.jit(lambda s: net.run(10, 500.0, s))(s0)
        out = einet_pallas_sim(net, s0, 10, 500.0, strategy='mxu2')
        assert int(ref.spike_count.sum()) > 100
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref.g_e),
                                   rtol=1e-4, atol=1e-4)

    def test_mxu3_strategy_matches_xla_loop(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30, strategy='mxu3')
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref.neurons.v), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_mxu3_multi_round_burst_exact(self):
        # saturating drive: actives exceed cap AND per-block ranks exceed
        # J -> both the slot-window and rank-window loops take extra rounds
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3
        net = EINet(scale=0.064, seed=3)
        s0 = net.init_state(jax.random.PRNGKey(0))
        ref = jax.jit(lambda s: net.run(10, 500.0, s))(s0)
        out = einet_pallas_sim_mxu3(net, s0, 10, 500.0)
        assert int(ref.spike_count.sum()) > 100
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        np.testing.assert_array_equal(np.asarray(out[2]),
                                      np.asarray(ref.g_e))

    @pytest.mark.slow
    def test_mxu3_knob_branches_exact(self):
        import jax.numpy as jnp
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu3
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(20, state=s))(s0)
        for kw in (dict(mask_dtype=jnp.bfloat16, operands='scratch'),
                   dict(mask_dtype=jnp.float32, operands='concat',
                        pack=False),
                   dict(table_space='hbm'),
                   dict(two_stage=False)):
            out = einet_pallas_sim_mxu3(net, s0, 20, **kw)
            np.testing.assert_array_equal(np.asarray(out[4]),
                                          np.asarray(ref.spike_count),
                                          err_msg=str(kw))

    def test_mxu5_strategy_matches_xla_loop(self):
        # channel-split scatter: exact vs the XLA loop (spike counts and v)
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30, strategy='mxu5')
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref.neurons.v), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_mxu5_burst_and_hbm_exact(self):
        # per-channel overflow rounds + the HBM-resident table path
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu5
        net = EINet(scale=0.064, seed=3)
        s0 = net.init_state(jax.random.PRNGKey(0))
        ref = jax.jit(lambda s: net.run(10, 500.0, s))(s0)
        out = einet_pallas_sim_mxu5(net, s0, 10, 500.0)
        assert int(ref.spike_count.sum()) > 100
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        np.testing.assert_array_equal(np.asarray(out[2]),
                                      np.asarray(ref.g_e))
        net2 = EINet(scale=0.1, coba=True, seed=1)
        s2 = net2.init_state(jax.random.PRNGKey(2))
        ref2 = jax.jit(lambda s: net2.run(20, state=s))(s2)
        out2 = einet_pallas_sim_mxu5(net2, s2, 20, table_space='hbm')
        np.testing.assert_array_equal(np.asarray(out2[4]),
                                      np.asarray(ref2.spike_count))

    def test_mxu6_strategy_matches_xla_loop(self):
        # partitioned-table two-level one-hot scatter: exact vs the XLA
        # loop with multiple partitions forced (rpb=3 -> P=2 at 400
        # neurons; validated exact on the v5e at 4k vs the mxu3 oracle)
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu6
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref.neurons.v), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    def test_mxu6_radix_channels_bitwise_equal(self):
        # r4 radix channel packing: every radix (and 'auto') must produce
        # bitwise-identical states — the acc layout nests channels inside
        # the class bands so W2p/dot shapes never change (BENCH_NOTES r4c)
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu6
        net = EINet(scale=0.32, coba=True, seed=5)
        s0 = net.init_state(jax.random.PRNGKey(7))
        outs = {}
        for radix in (3, 6, 12, 'auto'):
            outs[radix] = einet_pallas_sim_mxu6(
                net, s0, 25, rpb=12, prefetch=False, radix=radix)
        for radix in (6, 12, 'auto'):
            for a, b, name in zip(outs[3], outs[radix],
                                  ('v', 'tl', 'ge', 'gi', 'cnt')):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f'radix={radix} field={name}')
        assert int(np.asarray(outs[3][4]).sum()) > 0

    def test_mxu6_compact_dot_exact(self):
        # compact_dot: the compaction phase's rank scatter through the
        # two-level (hi, lo) MXU dot instead of the (R, cap) one-hot.
        # cap_divisor=1 forces cap=512 at 400 neurons so the multi-tile
        # hi axis (nhi=4) is exercised; the plain case runs nhi=1.
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu6
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        for kw in ({'compact_dot': True},
                   {'compact_dot': True, 'cap_divisor': 1}):
            out = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2,
                                        gather='block', **kw)
            np.testing.assert_array_equal(np.asarray(out[4]),
                                          np.asarray(ref.spike_count),
                                          err_msg=str(kw))
        # overflow rounds (n_act > cap) through the dot path
        net2 = EINet(scale=0.064, seed=3)
        s2 = net2.init_state(jax.random.PRNGKey(0))
        ref2 = jax.jit(lambda s: net2.run(10, 500.0, s))(s2)
        out2 = einet_pallas_sim_mxu6(net2, s2, 10, 500.0, rpb=3, group=4,
                                     gather='block', compact_dot=True,
                                     cap_divisor=10000)
        np.testing.assert_array_equal(np.asarray(out2[4]),
                                      np.asarray(ref2.spike_count))

    def test_mxu6_tier_split_exact(self):
        # tiered event scatter (tier_w): clean events (per-partition
        # out-degree <= tier_w everywhere) sweep only the first tier_w
        # slots of each partition segment; dirty events sweep all. Both
        # passes hit the same table, so the result is exact regardless
        # of the tier boundary.
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu6
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        for tw in (2, 4, 8):
            out = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2,
                                        gather='block', tier_w=tw)
            np.testing.assert_array_equal(np.asarray(out[4]),
                                          np.asarray(ref.spike_count),
                                          err_msg=f'tier_w={tw}')
        with pytest.raises(ValueError, match="requires gather='block'"):
            einet_pallas_sim_mxu6(net, s0, 1, rpb=3, group=2,
                                  gather='rows', tier_w=2)
        with pytest.raises(ValueError, match='multiple of'):
            einet_pallas_sim_mxu6(net, s0, 1, rpb=3, group=2,
                                  gather='block', tier_w=3)

    @pytest.mark.slow
    def test_mxu6_burst_and_knob_branches_exact(self):
        # overflow rounds through the partitioned factor loop, plus the
        # HBM-table / group=1 / f32-mask / clamped-rpb branches
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu6
        net = EINet(scale=0.064, seed=3)
        s0 = net.init_state(jax.random.PRNGKey(0))
        ref = jax.jit(lambda s: net.run(10, 500.0, s))(s0)
        out = einet_pallas_sim_mxu6(net, s0, 10, 500.0, rpb=3, group=4)
        assert int(ref.spike_count.sum()) > 100
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        np.testing.assert_array_equal(np.asarray(out[2]),
                                      np.asarray(ref.g_e))
        net2 = EINet(scale=0.1, coba=True, seed=1)
        s2 = net2.init_state(jax.random.PRNGKey(2))
        ref2 = jax.jit(lambda s: net2.run(20, state=s))(s2)
        for kw in (dict(table_space='hbm', rpb=3),
                   dict(group=1, rpb=6),
                   dict(mask_dtype=jnp.float32, rpb=3),
                   dict(factor_unroll=2, rpb=3),   # paired build/dot chains
                   dict(factor_unroll=3, rpb=3),   # odd tail group path
                   dict(gather='block', rpb=3),    # event-major c-groups
                   dict(gather='block', rpb=3, table_space='hbm'),
                   # banked DMA/compute overlap (hbm-only; both layouts)
                   dict(prefetch=True, rpb=3, table_space='hbm'),
                   dict(prefetch=True, gather='block', rpb=3,
                        table_space='hbm', factor_unroll=2),
                   # single (group,128) dynamic load per column group
                   dict(fused_load=True, rpb=3),
                   dict(fused_load=True, prefetch=True, rpb=3,
                        table_space='hbm', gather='block'),
                   # fused_load=2: one (u*group,128) load per unroll body
                   dict(fused_load=2, factor_unroll=2, rpb=3),
                   dict(fused_load=2, factor_unroll=2, prefetch=True,
                        rpb=3, table_space='hbm', gather='block'),
                   # block_pack: bp event blocks per contraction (dead
                   # trailing sub-blocks masked), with and without split
                   dict(block_pack=2, factor_unroll=2, fused_load=2,
                        rpb=3),
                   dict(block_pack=3, ei_split=False, rpb=3,
                        gather='block', table_space='hbm', prefetch=True),
                   # m1 select-fusion (where(eq, val, 0) event one-hot)
                   dict(m1_fuse=True, rpb=3),
                   # tiered event scatter under the tuned knob stack
                   # (tier_w must be a multiple of lr*group)
                   dict(tier_w=4, rpb=3, gather='block', factor_unroll=2,
                        fused_load=2, prefetch=True, table_space='hbm'),
                   dict(tier_w=8, rpb=3, gather='block', ei_split=False),
                   # compaction rank granularity (lpass trips x ranks)
                   dict(compact_j=1, rpb=3),
                   dict(compact_j=2, rpb=3, gather='block',
                        table_space='hbm', prefetch=True),
                   dict(m1_fuse=True, fused_load=2, factor_unroll=2,
                        prefetch=True, rpb=3, table_space='hbm',
                        gather='block'),
                   # single full-height factor loop (no E/I block split)
                   dict(ei_split=False, rpb=3),
                   dict(ei_split=False, fused_load=2, factor_unroll=2,
                        prefetch=True, rpb=3, table_space='hbm',
                        gather='block'),
                   dict()):      # rpb clamps to the whole (padded) net
            out2 = einet_pallas_sim_mxu6(net2, s2, 20, **kw)
            np.testing.assert_array_equal(np.asarray(out2[4]),
                                          np.asarray(ref2.spike_count),
                                          err_msg=str(kw))

    @pytest.mark.slow
    def test_mxu6_multitile_rows_exact(self):
        # lane_rows > 128 (lr=2): the table flattens to (num*lr, 128) so
        # every HBM row DMA is one 128-lane tile (Mosaic rejects
        # unaligned 1-row slices of multi-tile rows); exact in both
        # table spaces and through the precomputed conn_table route
        from brainevent_tpu.models.pallas_sim import (einet_pallas_sim_mxu6,
                                                      mxu6_conn_table,
                                                      _mxu6_layout)
        net = EINet(scale=0.3, coba=True, seed=1)
        assert _mxu6_layout(net, 3, 2)[8] // 128 == 2    # lr = 2
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2,
                                    table_space='hbm')
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        tb = mxu6_conn_table(net, rpb=3, group=2)
        assert tb.shape == (_mxu6_layout(net, 3, 2)[0] * 2, 128)
        out2 = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2,
                                     conn_table=tb)
        np.testing.assert_array_equal(np.asarray(out2[4]),
                                      np.asarray(ref.spike_count))
        # event-major (gather='block') at lr=2: events interleave with
        # slots inside each transposed chunk; precomputed-table route
        assert _mxu6_layout(net, 3, 2, 'block')[8] // 128 == 2
        tb_cg = mxu6_conn_table(net, rpb=3, group=2, gather='block')
        out3 = einet_pallas_sim_mxu6(net, s0, 30, rpb=3, group=2,
                                     gather='block', table_space='hbm',
                                     conn_table=tb_cg)
        np.testing.assert_array_equal(np.asarray(out3[4]),
                                      np.asarray(ref.spike_count))

    def test_factor_plan_bodies_and_singles(self):
        # tier sweep plans: contiguous runs split into u-wide bodies
        # (wide-load eligible) plus leftover singles; coverage is exact
        # and disjoint
        from brainevent_tpu.models.pallas_sim import _factor_plan
        for cgs, u in (([0, 1, 2, 3, 4, 8, 9, 10], 2),
                       ([0, 2, 4, 6], 4),
                       (list(range(13)), 4),
                       ([5], 3)):
            bodies, singles = _factor_plan(cgs, u)
            covered = sorted(singles + [b + k for b in bodies
                                        for k in range(u)])
            assert covered == sorted(cgs), (cgs, u, bodies, singles)
            # bodies start u-aligned runs: every body's span is contiguous
            s = set(cgs)
            for b in bodies:
                assert all(b + k in s for k in range(u))
        # u=1 degenerates to all singles
        bodies, singles = _factor_plan([3, 4, 7], 1)
        assert bodies == [] and singles == [3, 4, 7]

    def test_partition_table_layout(self):
        # every target lands in its partition's segment as a local id;
        # empty slots are -1; pmap maps column groups to partitions
        from brainevent_tpu.models.pallas_sim import _partition_table
        rng = np.random.default_rng(0)
        conn = rng.integers(0, 1000, size=(50, 16)).astype(np.int32)
        span, P, G = 256, 4, 2
        table, pmap, offs = _partition_table(conn, span, P, G)
        assert table.shape[1] == offs[-1] and len(pmap) == offs[-1] // G
        for i in range(50):
            got = []
            for p in range(P):
                seg = table[i, offs[p]:offs[p + 1]]
                filled = seg[seg >= 0]
                assert (filled < span).all() and (filled >= 0).all()
                got.extend((filled + p * span).tolist())
            assert sorted(got) == sorted(conn[i].tolist())
        for g, p in enumerate(pmap):
            assert offs[p] <= g * G < offs[p + 1]

    def test_dense_strategy_matches_xla_loop(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.1, coba=True, seed=1)
        s0 = net.init_state(jax.random.PRNGKey(2))
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30, strategy='dense')
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    def test_mxu_strategy_matches_xla_loop(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.032, coba=True)
        s0 = net.init_state()
        ref = jax.jit(lambda s: net.run(30, state=s))(s0)
        out = einet_pallas_sim(net, s0, 30, strategy='mxu')
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref.neurons.v), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_mxu_overflow_fallback_exact(self):
        # saturating drive: per-step actives exceed the event-buffer
        # capacity, exercising the in-kernel per-event fallback
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim
        net = EINet(scale=0.064, seed=3)  # cap_e=32 << n_exc
        s0 = net.init_state(jax.random.PRNGKey(0))
        ref = jax.jit(lambda s: net.run(12, 500.0, s))(s0)
        out = einet_pallas_sim(net, s0, 12, 500.0, strategy='mxu')
        assert int(ref.spike_count.sum()) > 100  # genuinely saturated
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref.g_e),
                                   rtol=1e-4, atol=1e-4)

    def test_vmem_budget_guard(self):
        # 400k neurons: the table exceeds VMEM, so forcing a VMEM-resident
        # table must raise; the default ('auto') instead selects the
        # HBM-resident table with per-event DMA row fetches and builds.
        from brainevent_tpu.models.pallas_sim import (
            einet_pallas_sim_mxu2, einet_pallas_sim_mxu3)
        net = EINet(scale=100.0)
        state = net.init_state()
        with pytest.raises(ValueError, match='VMEM'):
            einet_pallas_sim_mxu3(net, state, 1, table_space='vmem')
        with pytest.raises(ValueError, match='VMEM'):
            einet_pallas_sim_mxu2(net, state, 1)


class TestSurrogateTraining:
    def test_gradients_flow_and_loss_decreases(self, rng):
        from brainevent_tpu.models.training import (
            SurrogateSNN, train_step, snn_loss)
        model = SurrogateSNN(n_in=20, n_hidden=100, n_out=4, n_conn=16)
        params = model.init_params()
        inputs = jnp.asarray(rng.random((30, 20)).astype(np.float32))
        label = jnp.asarray(2)

        step = jax.jit(lambda p: train_step(model, p, inputs, label, lr=0.5))
        losses = []
        for _ in range(10):
            params, loss = step(params)
            losses.append(float(loss))
        assert losses[-1] < losses[0], f'loss did not decrease: {losses}'

    def test_grads_nonzero_through_event_path(self, rng):
        from brainevent_tpu.models.training import SurrogateSNN, snn_loss
        model = SurrogateSNN(n_in=10, n_hidden=64, n_out=3, n_conn=8)
        params = model.init_params()
        inputs = jnp.asarray(rng.random((20, 10)).astype(np.float32))
        grads = jax.grad(lambda p: snn_loss(model, p, inputs, jnp.asarray(1))
                         )(params)
        assert float(jnp.abs(grads.w_rec).sum()) > 0
        assert float(jnp.abs(grads.w_in).sum()) > 0


class TestBatchedSimulation:
    def test_vmap_over_initial_states(self, rng):
        """vmap over a batch of network states exercises the batching rules
        of the event primitives end-to-end."""
        net = EINet(scale=0.05, coba=True)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        states = jax.vmap(net.init_state)(keys)
        run = jax.jit(jax.vmap(lambda s: net.run(100, state=s)))
        out = run(states)
        assert out.spike_count.shape == (4, net.num)
        counts = np.asarray(out.spike_count.sum(axis=1))
        assert (counts > 0).all()
        # different seeds -> different trajectories
        assert len(set(counts.tolist())) > 1


class TestMxu4:
    """Chunked-state mega-kernel: exactness across chunk sizes, burst
    rounds, and CUBA/COBA (interpret mode)."""

    @pytest.mark.slow
    def test_exact_multi_chunk(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu4
        net = EINet(scale=0.1, n_conn=16, seed=3)
        state = net.init_state(jax.random.PRNGKey(1))
        ref = jax.jit(lambda s: net.run(40, 20.0, s))(state)
        for ch in (1, 2):
            out = einet_pallas_sim_mxu4(net, state, 40, 20.0, row_chunk=ch)
            np.testing.assert_array_equal(np.asarray(out[4]),
                                          np.asarray(ref.spike_count))
            np.testing.assert_allclose(np.asarray(out[2]),
                                       np.asarray(ref.g_e),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_burst_overflow_rounds(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu4
        net = EINet(scale=0.1, n_conn=16, seed=3)
        state = net.init_state(jax.random.PRNGKey(1))
        ref = jax.jit(lambda s: net.run(12, 500.0, s))(state)
        assert int(ref.spike_count.sum()) > 100
        out = einet_pallas_sim_mxu4(net, state, 12, 500.0, row_chunk=2)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    @pytest.mark.slow
    def test_cuba(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu4
        net = EINet(scale=0.2, n_conn=24, coba=False, seed=9)
        s = net.init_state(jax.random.PRNGKey(4))
        ref = jax.jit(lambda st: net.run(40, 20.0, st))(s)
        out = einet_pallas_sim_mxu4(net, s, 40, 20.0, row_chunk=1)
        np.testing.assert_array_equal(np.asarray(out[4]),
                                      np.asarray(ref.spike_count))

    def test_indegree_guard(self):
        from brainevent_tpu.models.pallas_sim import einet_pallas_sim_mxu4
        import brainevent_tpu.models.networks as nw
        net = EINet(scale=0.05, n_conn=8, seed=0)
        # force a pathological in-degree by pointing every synapse at 0
        net.conn_all = jnp.zeros_like(net.conn_all)
        with pytest.raises(ValueError, match='in-degree'):
            einet_pallas_sim_mxu4(net, net.init_state(), 1)


class TestSurrogateCustomVjp:
    def test_grads_match_dense_oracle(self, rng):
        """The scatter-free custom-VJP recurrent matvec must match
        autodiff through an explicit dense recurrent matrix."""
        from brainevent_tpu.models.training import SurrogateSNN, snn_loss
        from brainevent_tpu.models.neurons import surrogate_spike
        model = SurrogateSNN(n_in=12, n_hidden=60, n_out=3, n_conn=8, seed=2)
        params = model.init_params()
        x = jnp.asarray(rng.random((20, 12)).astype(np.float32))
        g = jax.grad(lambda p: snn_loss(model, p, x, jnp.asarray(1)))(params)
        idx = np.asarray(model.rec_indices)

        def dense_loss(wrec):
            rows = jnp.repeat(jnp.arange(60), 8)
            Wd = jnp.zeros((60, 60)).at[rows, idx.reshape(-1)].add(
                wrec.reshape(-1))
            decay = jnp.float32(jnp.exp(-model.dt / model.tau))

            def step(c, xt):
                v, s = c
                cur = xt @ params.w_in + Wd.T @ s
                v = v * decay + cur
                sn = surrogate_spike(v - model.v_th)
                return (v - sn * model.v_th, sn), sn

            (_, _), spikes = jax.lax.scan(
                step, (jnp.zeros(60), jnp.zeros(60)), x)
            return -jax.nn.log_softmax(spikes.mean(0) @ params.w_out)[1]

        gd = jax.grad(dense_loss)(params.w_rec)
        np.testing.assert_allclose(np.asarray(g.w_rec), np.asarray(gd),
                                   rtol=1e-4, atol=1e-5)

    def test_fwd_passes_2_close_to_exact(self, rng):
        """fwd_passes=2 (bf16-split forward plan) trades ~2^-16 relative
        error for ~35% forward time; loss and grads must stay within
        that band of the passes=3 exact route."""
        from brainevent_tpu.models.training import SurrogateSNN, snn_loss
        kw = dict(n_in=12, n_hidden=60, n_out=3, n_conn=8, seed=2)
        m3 = SurrogateSNN(**kw)
        m2 = SurrogateSNN(**kw, fwd_passes=2)
        p = m3.init_params()
        x = jnp.asarray(rng.random((20, 12)).astype(np.float32))
        l3 = float(snn_loss(m3, p, x, jnp.asarray(1)))
        l2 = float(snn_loss(m2, p, x, jnp.asarray(1)))
        np.testing.assert_allclose(l2, l3, rtol=1e-3)
        g3 = jax.grad(lambda q: snn_loss(m3, q, x, jnp.asarray(1)))(p)
        g2 = jax.grad(lambda q: snn_loss(m2, q, x, jnp.asarray(1)))(p)
        np.testing.assert_allclose(np.asarray(g2.w_rec),
                                   np.asarray(g3.w_rec),
                                   rtol=5e-3, atol=1e-5)


class TestTrainingConstsAPI:
    """The non-trainable array bundle must work as an explicit jit
    argument (the 10M-synapse scale embeds ~200 MB of constants into the
    compile request otherwise — the relay rejects it with HTTP 413)."""

    def _model(self, forward='plan'):
        from brainevent_tpu.models.training import SurrogateSNN
        return SurrogateSNN(n_in=12, n_hidden=128, n_out=4, n_conn=8,
                            seed=3, forward=forward)

    def test_consts_as_args_matches_default(self, rng):
        from brainevent_tpu.models.training import snn_loss
        m = self._model()
        p = m.init_params()
        x = jnp.asarray(rng.random((10, 12)).astype(np.float32))
        base = float(snn_loss(m, p, x, jnp.asarray(1)))
        via_args = float(jax.jit(
            lambda pp, cc: snn_loss(m, pp, x, jnp.asarray(1), consts=cc)
        )(p, m.consts()))
        np.testing.assert_allclose(via_args, base, rtol=1e-6)

    def test_grads_identical_both_routes(self, rng):
        from brainevent_tpu.models.training import snn_loss
        m = self._model()
        p = m.init_params()
        x = jnp.asarray(rng.random((10, 12)).astype(np.float32))
        g1 = jax.grad(lambda pp: snn_loss(m, pp, x, jnp.asarray(1)))(p)
        g2 = jax.jit(lambda pp, cc: jax.grad(
            lambda q: snn_loss(m, q, x, jnp.asarray(1), consts=cc))(pp)
        )(p, m.consts())
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_event_forward_same_grads_as_plan(self, rng):
        from brainevent_tpu.models.training import snn_loss
        mp = self._model('plan')
        me = self._model('event')
        p = mp.init_params()
        x = jnp.asarray(rng.random((8, 12)).astype(np.float32))
        gp = jax.grad(lambda pp: snn_loss(mp, pp, x, jnp.asarray(0)))(p)
        ge = jax.grad(lambda pp: snn_loss(me, pp, x, jnp.asarray(0)))(p)
        for a, b in zip(gp, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_sorted_view_roundtrip_and_vjp(self, rng):
        from brainevent_tpu.models.training import _sorted_view
        m = self._model()
        w = jnp.asarray(rng.normal(size=(128, 8)), jnp.float32)
        c = m.consts()
        ws = _sorted_view(w, c['perm'], c['inv'])
        back = np.asarray(ws).reshape(-1)[np.asarray(c['inv'])]
        np.testing.assert_allclose(back, np.asarray(w).reshape(-1))
        # VJP of the view is the inverse-perm gather: grad of sum(view)
        # w.r.t. w is all-ones (each weight appears exactly once)
        g = jax.grad(lambda ww: jnp.sum(_sorted_view(
            ww, c['perm'], c['inv'])))(w)
        np.testing.assert_allclose(np.asarray(g), 1.0)
