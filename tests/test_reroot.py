import pytest
"""Tree re-rooting (update_root reuse, MCTS.pyx:185-195) tests."""

import jax
import jax.numpy as jnp
import numpy as np

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T
from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.envs.tictactoe import TicTacToe
from alphazero_general_tpu.selfplay import (
    SelfPlayConfig,
    init_selfplay,
    play_chunk,
)

SPEC = T.SearchSpec(add_root_noise=False, add_root_temp=False,
                    num_players=2, has_draw=True)


def grown_tree(env, sims=50, seed=0):
    states = jax.tree_util.tree_map(lambda x: x[None], env.init())
    trees = S.init_batched_trees(env, states, 2 * sims + 2, 3)
    eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3, uniform_value=True)
    return S.search(env, trees, SPEC, eval_fn, sims,
                    jax.random.PRNGKey(seed))


class TestReroot:
    @pytest.mark.slow
    def test_subtree_stats_preserved(self):
        env = Connect4
        trees = grown_tree(env, sims=60)
        counts = np.asarray(jax.vmap(T.counts)(trees))[0]
        action = int(counts.argmax())
        A = env.ACTION_SIZE
        root_kids = np.asarray(
            jax.vmap(lambda t: T.child_row(t, T.ROOT)[0])(trees)[0]
        )
        old_child = int(root_kids[action])
        old_n = int(trees.n[0, old_child])
        old_q = float(trees.q[0, old_child])

        # Grandchild visit profile (the new root's counts after reroot).
        gc = np.asarray(
            jax.vmap(lambda t: T.child_row(t, jnp.int32(old_child))[0])(
                trees)[0]
        )
        gc_counts = np.zeros(env.ACTION_SIZE, np.int64)
        for a, ci in enumerate(gc):
            if ci >= 0:
                gc_counts[a] = int(trees.n[0, ci])

        new = jax.vmap(lambda t, a: T.reroot(env, t, a))(
            trees, jnp.array([action])
        )
        assert int(new.n[0, 0]) == old_n
        np.testing.assert_allclose(float(new.q[0, 0]), old_q, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(T.counts)(new))[0], gc_counts
        )
        # Root state is the stepped state.
        expect = env.step(env.init(), action)
        np.testing.assert_array_equal(
            np.asarray(new.node_state.board[0, :42]).reshape(6, 7),
            np.asarray(expect.board)
        )
        # Arena is compact: next_free == subtree size ≤ old next_free.
        assert int(new.next_free[0]) <= int(trees.next_free[0])
        assert int(new.next_free[0]) >= 1

    def test_reroot_unvisited_edge_gives_fresh_tree(self):
        env = Connect4
        trees = grown_tree(env, sims=3)  # tiny: most edges unallocated
        counts = np.asarray(jax.vmap(T.counts)(trees))[0]
        unvisited = int(np.argmin(counts))  # some never-visited column
        assert counts[unvisited] == 0
        new = jax.vmap(lambda t, a: T.reroot(env, t, a))(
            trees, jnp.array([unvisited])
        )
        assert int(new.next_free[0]) == 1
        assert int(new.n[0, 0]) == 0
        expect = env.step(env.init(), unvisited)
        np.testing.assert_array_equal(
            np.asarray(new.node_state.board[0, :42]).reshape(6, 7),
            np.asarray(expect.board)
        )

    @pytest.mark.slow
    def test_search_continues_after_reroot(self):
        """Re-rooted trees keep accumulating correct statistics."""
        env = TicTacToe
        trees = grown_tree(env, sims=40)
        counts = np.asarray(jax.vmap(T.counts)(trees))[0]
        action = int(counts.argmax())
        new = jax.vmap(lambda t, a: T.reroot(env, t, a))(
            trees, jnp.array([action])
        )
        carried = int(new.n[0, 0])
        eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3, uniform_value=True)
        new = S.search(env, new, SPEC, eval_fn, 20, jax.random.PRNGKey(5))
        assert int(new.n[0, 0]) == carried + 20
        c = np.asarray(jax.vmap(T.counts)(new))[0]
        assert c.sum() >= 20  # carried grandchild visits + new sims


class TestSelfPlayWithReuse:
    def test_reuse_chunk_runs_and_accumulates(self):
        env = TicTacToe
        cfg = SelfPlayConfig(
            sims_full=10, sims_fast=5, sims_warmup=5, prob_fast=0.0,
            reuse_tree=True,
            spec=SPEC._replace(add_root_noise=True, add_root_temp=True),
        )
        B, K = 8, 12
        carry = init_selfplay(env, B, cfg.start_temp, cfg=cfg)
        assert carry.trees is not None
        eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3, uniform_value=True)

        def chunk(c, r):
            return play_chunk(env, cfg, eval_fn, c, r, K)

        carry, rec = jax.jit(chunk)(carry, jax.random.PRNGKey(0))
        done = np.asarray(rec.done)
        assert done.any(), "games should finish"
        # Actions legal in every recorded step.
        obs = np.asarray(rec.obs)
        act = np.asarray(rec.action)
        for t in range(K):
            for b in range(B):
                assert obs[t, b, 0].reshape(-1)[act[t, b]] == 0

    def test_reuse_matches_capacity_bound(self):
        env = TicTacToe
        cfg = SelfPlayConfig(sims_full=10, sims_fast=5, prob_fast=0.0,
                             reuse_tree=True, spec=SPEC)
        B, K = 4, 15
        carry = init_selfplay(env, B, cfg.start_temp, cfg=cfg)
        eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3, uniform_value=True)
        carry, _ = jax.jit(
            lambda c, r: play_chunk(env, cfg, eval_fn, c, r, K)
        )(carry, jax.random.PRNGKey(1))
        assert int(jnp.max(carry.trees.next_free)) <= cfg.capacity
