"""Growing-arena segmented search: exact parity with the flat scan.

Fresh-tree searches split their sim scan into segments running on leading-
row slices of the arena (search._segment_plan). Same RNG keys, same slots —
results must be byte-identical to the single-segment scan on both the
batch-major XLA path and the game-minor TreeT (Pallas-interpret) path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T
from alphazero_general_tpu.envs import get_env


def _run_search(env, sims, rng, walk_impl, B=16):
    if walk_impl.startswith("pallas"):
        B = 128  # kernel lane width
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    spec = T.SearchSpec(num_players=2, has_draw=True)
    eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3, uniform_value=True)
    trees = S.init_batched_trees(env, states, sims + 2, 3)
    return S.search(env, trees, spec, eval_fn, sims, rng,
                    walk_impl=walk_impl)


def _flat_plan(sims, rows, min_nodes=32):
    return [(rows, 1, sims)]


class TestSegmentPlan:
    def test_covers_all_sims_in_order(self):
        for sims, rows in [(200, 203), (40, 43), (10, 13), (2, 5),
                           (100, 300), (31, 34)]:
            plan = S._segment_plan(sims, rows)
            ks = [k for (_, lo, hi) in plan for k in range(lo, hi)]
            assert ks == list(range(1, sims)), (sims, rows, plan)
            for n, lo, hi in plan:
                assert hi <= n - 1 or n == rows, (sims, rows, plan)
                assert n <= rows

    def test_small_search_is_single_segment(self):
        assert S._segment_plan(10, 13) == [(13, 1, 10)]

    def test_big_search_segments_double(self):
        plan = S._segment_plan(200, 203)
        assert plan == [(32, 1, 31), (64, 31, 63), (128, 63, 127),
                        (203, 127, 200)]


class TestSegmentedParity:
    @pytest.mark.parametrize("envname", ["connect4", "tictactoe"])
    def test_xla_path_matches_flat_scan(self, envname, monkeypatch):
        env = get_env(envname)
        rng = jax.random.PRNGKey(7)
        seg = _run_search(env, 40, rng, "xla")
        monkeypatch.setattr(S, "_segment_plan", _flat_plan)
        flat = _run_search(env, 40, rng, "xla")
        # The dummy sink row (last) legitimately differs: the flat scan
        # accumulates terminal-revisit junk there across ALL sims while each
        # segment parks junk at its own slice sink (restored on merge). All
        # REACHABLE state must match exactly.
        def mask_sink(t):
            return t.replace(
                parent=t.parent.at[:, -1].set(0),
                parent_action=t.parent_action.at[:, -1].set(0))
        for a, b in zip(jax.tree_util.tree_leaves(mask_sink(seg)),
                        jax.tree_util.tree_leaves(mask_sink(flat))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_treet_path_matches_flat_scan(self, monkeypatch):
        env = get_env("connect4")
        rng = jax.random.PRNGKey(3)
        seg = _run_search(env, 40, rng, "pallas_interpret")
        monkeypatch.setattr(S, "_segment_plan", _flat_plan)
        flat = _run_search(env, 40, rng, "pallas_interpret")
        for a, b in zip(jax.tree_util.tree_leaves(seg),
                        jax.tree_util.tree_leaves(flat)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_treet_matches_xla_segmented(self):
        env = get_env("connect4")
        rng = jax.random.PRNGKey(11)
        a = _run_search(env, 40, rng, "pallas_interpret")
        b = _run_search(env, 40, rng, "xla", B=128)
        np.testing.assert_array_equal(np.asarray(jax.vmap(T.counts)(a)),
                                      np.asarray(jax.vmap(T.counts)(b)))
        np.testing.assert_allclose(np.asarray(jax.vmap(lambda t: T.probs(t, 1.0))(a)),
                                   np.asarray(jax.vmap(lambda t: T.probs(t, 1.0))(b)),
                                   rtol=1e-6)


class TestRightSizedArenas:
    def test_move_kinds_build_right_sized_arenas(self, monkeypatch):
        """Fast/full/warmup move fns build fresh arenas sized to their own
        sim count (fast moves must not walk full-search-sized buffers)."""
        import alphazero_general_tpu.selfplay.selfplay as SP
        from alphazero_general_tpu.selfplay.selfplay import (
            SelfPlayConfig, init_selfplay, make_move_fns,
        )
        env = get_env("tictactoe")
        cfg = SelfPlayConfig(
            sims_full=24, sims_fast=6, sims_warmup=4,
            spec=SelfPlayConfig().spec._replace(
                num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW),
        )

        seen = {}
        real_init = SP.S.init_batched_trees

        def capture(env_, states, capacity, value_size):
            seen["capacity"] = capacity
            return real_init(env_, states, capacity, value_size)

        monkeypatch.setattr(SP.S, "init_batched_trees", capture)

        def apply_fn(variables, obs):
            B = obs.shape[0]
            logp = jnp.zeros((B, env.ACTION_SIZE))
            logv = jnp.zeros((B, 3))
            return jax.nn.log_softmax(logp), jax.nn.log_softmax(logv)

        fns = make_move_fns(env, cfg, apply_fn)
        carry = init_selfplay(env, 8, 1.0)
        carry, rec = fns["fast"](None, carry, jax.random.PRNGKey(0))
        assert seen["capacity"] == cfg.sims_fast + 2
        # Fast-sim rounds ship no obs/pi — their samples are discarded at
        # finalize anyway (SelfPlayAgent.pyx:161 fast-sim discard semantics).
        assert rec.pi is None and rec.obs is None
        carry, rec = fns["full"](None, carry, jax.random.PRNGKey(1))
        assert seen["capacity"] == cfg.sims_full + 2
        assert np.allclose(np.asarray(rec.pi).sum(-1), 1.0, atol=1e-5)
        carry, rec = fns["warmup"](None, carry, jax.random.PRNGKey(2))
        assert seen["capacity"] == cfg.sims_warmup + 2
