"""Multi-leaf search rounds (search._round_step_t, leaf_batch > 1).

K walks per network call with virtual-loss-style diversification: pending
(allocated, un-backed-up) children score q=0 and stop the walk; their
observation is re-derived from the stored leaf state. These tests pin the
invariants that hold regardless of K: visit accounting, valid-action
policies, terminal handling, and search quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T
from alphazero_general_tpu.envs import get_env

SPEC = T.SearchSpec(num_players=2, has_draw=True)
B = 128  # kernel lane width


def _search_k(env, states, sims, K, rng, eval_fn=None):
    eval_fn = eval_fn or S.uniform_eval_fn(env.ACTION_SIZE, 3,
                                           uniform_value=True)
    trees = S.init_batched_trees(env, states, sims + 2, 3)
    return S.search(env, trees, SPEC, eval_fn, sims, rng,
                    walk_impl="pallas_interpret", leaf_batch=K)


def _init_states(env, b=B):
    return jax.vmap(lambda _: env.init())(jnp.arange(b))


class TestMultiLeaf:
    @pytest.mark.parametrize("K", [2, 4])
    def test_visit_accounting(self, K):
        env = get_env("tictactoe")
        sims = 21
        trees = _search_k(env, _init_states(env), sims, K,
                          jax.random.PRNGKey(0))
        # Every simulation backs up exactly once: root.n == sims, children
        # visits sum to sims - 1 (first sim expands the root). MCTS.pyx:289.
        assert np.all(np.asarray(trees.n[:, 0]) == sims)
        counts = np.asarray(jax.vmap(T.counts)(trees))
        assert np.all(counts.sum(-1) == sims - 1)

    def test_k1_unchanged_vs_default_path(self):
        env = get_env("tictactoe")
        rng = jax.random.PRNGKey(3)
        a = _search_k(env, _init_states(env), 17, 1, rng)
        trees = S.init_batched_trees(env, _init_states(env), 19, 3)
        b = S.search(env, trees, SPEC,
                     S.uniform_eval_fn(env.ACTION_SIZE, 3,
                                       uniform_value=True),
                     17, rng, walk_impl="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(jax.vmap(T.counts)(a)),
                                      np.asarray(jax.vmap(T.counts)(b)))

    def test_finds_immediate_win_with_rounds(self):
        """Search quality: K=4 raw search still piles visits on the winning
        move (three-in-a-row threat for the mover)."""
        env = get_env("tictactoe")
        s = env.init()
        for m in (0, 3, 1, 4):  # X at 0,1; O at 3,4; X wins at 2
            s = env.step(s, m)
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), s)
        trees = _search_k(env, states, 40, 4, jax.random.PRNGKey(1))
        counts = np.asarray(jax.vmap(T.counts)(trees))
        assert np.all(counts.argmax(-1) == 2), counts[0]

    def test_terminal_root_rounds(self):
        """All-terminal batch: rounds must not corrupt stats or crash."""
        env = get_env("tictactoe")
        s = env.init()
        for m in (0, 3, 1, 4, 2):  # X already won
            s = env.step(s, m)
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), s)
        trees = _search_k(env, states, 9, 4, jax.random.PRNGKey(2))
        assert np.all(np.asarray(trees.n[:, 0]) == 9)
        assert np.all(np.asarray(jax.vmap(T.counts)(trees)).sum(-1) == 0)

    def test_selfplay_with_leaf_batch(self):
        from alphazero_general_tpu.selfplay.selfplay import (
            SelfPlayConfig, init_selfplay, make_move_fns,
        )
        env = get_env("tictactoe")
        cfg = SelfPlayConfig(
            sims_full=9, sims_fast=5, leaf_batch=3,
            spec=SelfPlayConfig().spec._replace(
                num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW),
        )

        def apply_fn(variables, obs):
            Bb = obs.shape[0]
            logp = jnp.zeros((Bb, env.ACTION_SIZE))
            logv = jnp.zeros((Bb, 3))
            return jax.nn.log_softmax(logp), jax.nn.log_softmax(logv)

        # CPU runs the XLA path (kernel-ineligible) → leaf_batch silently 1;
        # the config must still produce working move fns.
        fns = make_move_fns(env, cfg, apply_fn)
        carry = init_selfplay(env, 8, 1.0)
        carry, rec = fns["full"](None, carry, jax.random.PRNGKey(5))
        assert np.allclose(np.asarray(rec.pi).sum(-1), 1.0, atol=1e-5)
