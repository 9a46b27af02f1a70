"""Pallas descent kernel parity: interpret-mode kernel vs the XLA walk must
produce byte-identical searches (same tiebreak streams)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T
from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.envs.tictactoe import TicTacToe

SPEC = T.SearchSpec(
    cpuct=1.25, fpu_reduction=0.2, min_discount=0.8,
    add_root_noise=False, add_root_temp=False,
    num_players=2, has_draw=True,
)


def pseudo_net(obs):
    obs = jnp.asarray(obs, jnp.float32)
    B = obs.shape[0]
    flat = obs.reshape(B, -1)
    A = 7 if flat.shape[1] == 4 * 6 * 7 else 9
    w = jnp.sin(jnp.arange(flat.shape[1], dtype=jnp.float32)[:, None]
                * jnp.arange(1, A + 1)[None, :] * 0.37)
    pi = jax.nn.softmax(flat @ w, axis=-1)
    vw = jnp.cos(jnp.arange(flat.shape[1], dtype=jnp.float32)[:, None]
                 * jnp.array([0.11, 0.23, 0.31])[None, :])
    value = jax.nn.softmax(flat @ vw, axis=-1)
    return pi, value


def batch_states(env, B, rng_seed=0):
    """Random short openings so trees differ across the batch."""
    rng = np.random.default_rng(rng_seed)
    states = []
    for b in range(B):
        s = env.init()
        for _ in range(int(rng.integers(0, 4))):
            valids = np.flatnonzero(np.asarray(env.valid_moves(s)))
            s = env.step(s, int(rng.choice(valids)))
        states.append(s)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


@pytest.mark.parametrize("env,sims", [
    pytest.param(Connect4, 40, marks=pytest.mark.slow),  # bigger-A twin of
    (TicTacToe, 30),                                     # the quick case
])
def test_pallas_matches_xla_search(env, sims):
    B = 128  # kernel lane width
    states = batch_states(env, B)
    rng = jax.random.PRNGKey(0)

    def run(walk_impl):
        trees = S.init_batched_trees(env, states, sims + 2, 3)
        return S.search(env, trees, SPEC, pseudo_net, sims, rng,
                        walk_impl=walk_impl)

    t_x = run("xla")
    t_p = run("pallas_interpret")

    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    # The last row is the dummy write sink — junk by design (masked writes
    # route there in the batch-major path; the game-minor path never touches
    # it), so the comparison excludes it.
    np.testing.assert_array_equal(np.asarray(t_x.parent)[:, :-1],
                                  np.asarray(t_p.parent)[:, :-1])
    np.testing.assert_array_equal(np.asarray(t_x.parent_action)[:, :-1],
                                  np.asarray(t_p.parent_action)[:, :-1])
    np.testing.assert_allclose(np.asarray(t_x.q), np.asarray(t_p.q),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(T.counts)(t_x)),
        np.asarray(jax.vmap(T.counts)(t_p)),
    )


def test_walk_outputs_match_directly():
    """Single-sim walk: (node, action, child, depth) identical per game."""
    B = 128
    env = Connect4
    states = batch_states(env, B, rng_seed=3)
    trees = S.init_batched_trees(env, states, 34, 3)
    # Grow trees a bit first (XLA path).
    trees = S.search(env, trees, SPEC, pseudo_net, 30, jax.random.PRNGKey(1),
                     walk_impl="xla")

    xla = jax.vmap(lambda t: T.descend(t, SPEC))(trees)
    pal = S._batched_walk(trees, SPEC, "pallas_interpret")
    for a, b, name in zip(xla, pal, ["node", "action", "child", "depth",
                                     "skip", "p_sel"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.mark.slow
def test_big_action_space_hybrid_treet():
    """Rank-walk kernel on a big-row env (hnefatafl A=2420): the hybrid
    batch-major TreeT path (tree_t big_rows) must match the XLA walk
    byte-for-byte, including the expanded bitmask reconstructed from the
    descending-(prior, -index) expansion invariant."""
    from alphazero_general_tpu.envs import get_env

    env = get_env("hnefatafl")
    B, sims = 128, 16
    rng = jax.random.PRNGKey(0)
    states = jax.vmap(lambda i: env.init())(jnp.arange(B))
    eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, 3)

    def run(impl):
        trees = S.init_batched_trees(env, states, sims + 2, 3)
        return S.search(env, trees, SPEC, eval_fn, sims, rng, walk_impl=impl)

    t_x = run("xla")
    t_p = run("pallas_interpret")
    np.testing.assert_array_equal(np.asarray(t_x.n), np.asarray(t_p.n))
    np.testing.assert_array_equal(np.asarray(t_x.parent)[:, :-1],
                                  np.asarray(t_p.parent)[:, :-1])
    np.testing.assert_array_equal(np.asarray(t_x.parent_action)[:, :-1],
                                  np.asarray(t_p.parent_action)[:, :-1])
    np.testing.assert_allclose(np.asarray(t_x.q), np.asarray(t_p.q),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t_x.expanded)[:, :-1],
                                  np.asarray(t_p.expanded)[:, :-1])


def test_rank_pointer_tracks_mask_truth():
    """After any search, each reachable node's (nba, nbp) must equal the
    argmax/max of its stored prior row over valid & unexpanded actions —
    the rank-walk pointer invariant the kernel relies on."""
    env = Connect4
    B = 128
    states = batch_states(env, B, rng_seed=5)
    trees = S.search(env, S.init_batched_trees(env, states, 34, 3), SPEC,
                     pseudo_net, 30, jax.random.PRNGKey(2), walk_impl="xla")
    A = env.ACTION_SIZE
    prior = np.asarray(trees.prior).reshape(B, -1, A)
    expanded = np.asarray(trees.expanded)
    nba = np.asarray(trees.nba)
    nbp = np.asarray(trees.nbp)
    n = np.asarray(trees.n)
    W32 = (A + 31) // 32
    for b in range(0, B, 17):
        for m in range(prior.shape[1] - 1):
            if n[b, m] == 0:
                continue  # unallocated or pending row
            row = prior[b, m]
            bits = np.unpackbits(
                expanded[b].reshape(-1, W32)[m].view(np.uint8),
                bitorder="little")[:A].astype(bool)
            mask = (row >= 0) & ~bits
            if not mask.any():
                assert nbp[b, m] < 0, (b, m)
            else:
                best = np.flatnonzero(mask & (row == row[mask].max()))[0]
                assert nba[b, m] == best, (b, m, nba[b, m], best)
                np.testing.assert_allclose(nbp[b, m], row[best])


@pytest.mark.slow
def test_walk_matches_after_reroot():
    """Rank-walk pointers must survive reroot compaction: grow trees, reroot
    every game at its best action, then the kernel walk on the rerooted
    trees must equal the XLA walk (which recomputes from the expanded
    bitmask — carried independently of the pointers)."""
    env = Connect4
    B = 128
    states = batch_states(env, B, rng_seed=9)
    trees = S.search(env, S.init_batched_trees(env, states, 66, 3), SPEC,
                     pseudo_net, 30, jax.random.PRNGKey(4), walk_impl="xla")
    actions = jax.vmap(T.best_action)(trees)
    rerooted = jax.vmap(lambda t, a: T.reroot(env, t, a))(trees, actions)
    # Continue searching the rerooted trees (general, non-fresh path).
    cont = S.search(env, rerooted, SPEC, pseudo_net, 10,
                    jax.random.PRNGKey(5), walk_impl="xla",
                    fresh_tree=False)
    xla = jax.vmap(lambda t: T.descend(t, SPEC))(cont)
    pal = S._batched_walk(cont, SPEC, "pallas_interpret")
    for a, b, name in zip(xla, pal, ["node", "action", "child", "depth",
                                     "skip", "p_sel"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
