"""Nim3 (3-player) env rules + N-model arena routing tests.

Covers the N-player capability the reference advertises (README.md:16,
Arena.pyx players list) and the arena's per-model evaluation routing
(selfplay/arena.py grouped eval vs the evaluate-all fallback).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs import get_env, list_envs
from alphazero_general_tpu.envs.nim import MAX_TAKE, NUM_PLAYERS, PILE, Nim3
from alphazero_general_tpu.envs.tictactoe import TicTacToe
from alphazero_general_tpu.selfplay.arena import (
    ArenaConfig,
    make_arena_fn,
    make_multi_arena_fn,
    winrates,
)
import alphazero_general_tpu.mcts.tree as T


class TestNimRules:
    def test_init_and_steps(self):
        s = Nim3.init()
        assert int(s.pile) == PILE and int(s.player) == 0
        s = Nim3.step(s, 2)  # take 3
        assert int(s.pile) == PILE - 3 and int(s.player) == 1
        assert not np.any(np.asarray(Nim3.win_state(s)) > 0)

    def test_valid_moves_shrink_with_pile(self):
        s = Nim3.init()
        for _ in range(6):
            s = Nim3.step(s, 1)  # take 2 each → pile 15,13,...,3
        assert int(s.pile) == 3
        s = Nim3.step(s, 1)  # pile 1
        np.testing.assert_array_equal(
            np.asarray(Nim3.valid_moves(s)), [True, False, False])

    def test_winner_is_last_taker(self):
        s = Nim3.init()
        # P0 takes 3, P1 takes 3, P2 takes 3, P0 takes 3, P1 takes 3 → P1
        # takes the last token at pile 3.
        for _ in range(5):
            s = Nim3.step(s, 2)
        w = np.asarray(Nim3.win_state(s))
        np.testing.assert_array_equal(w, [0.0, 1.0, 0.0, 0.0])

    def test_registered(self):
        assert "nim3" in list_envs()
        assert get_env("nim3") is Nim3


def _pile_from_obs(obs):
    # plane 0 is the one-hot pile count
    return jnp.argmax(obs[:, 0, 0, :], axis=-1)


def _uniform_apply(variables, obs):
    B = obs.shape[0]
    logp = jnp.full((B, MAX_TAKE), -jnp.log(float(MAX_TAKE)))
    logv = jnp.full((B, NUM_PLAYERS + 1), -jnp.log(float(NUM_PLAYERS + 1)))
    return logp, logv


def _closer_apply(variables, obs):
    """Takes the whole pile whenever it can (immediate win)."""
    B = obs.shape[0]
    pile = _pile_from_obs(obs)
    can_win = (pile >= 1) & (pile <= MAX_TAKE)
    win_action = jnp.clip(pile - 1, 0, MAX_TAKE - 1)
    onehot = jax.nn.one_hot(win_action, MAX_TAKE)
    probs = jnp.where(
        can_win[:, None], onehot * 0.999 + 1e-3 / MAX_TAKE,
        jnp.full((B, MAX_TAKE), 1.0 / MAX_TAKE),
    )
    logv = jnp.full((B, NUM_PLAYERS + 1), -jnp.log(float(NUM_PLAYERS + 1)))
    return jnp.log(probs), logv


def _cfg(env):
    return ArenaConfig(
        sims=8, arena_temp=1.0,
        spec=T.SearchSpec(
            add_root_noise=False, add_root_temp=False,
            num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW,
        ),
    )


class TestMultiArena:
    def test_three_uniform_models_split_evenly(self):
        arena = make_multi_arena_fn(
            Nim3, _cfg(Nim3), [_uniform_apply] * 3, num_games=48)
        res = arena([{}, {}, {}], jax.random.PRNGKey(0))
        wins = np.asarray(res.model_wins)
        assert wins.sum() + float(res.draws) == 48
        assert (wins > 4).all(), f"uniform models too lopsided: {wins}"

    def test_stronger_model_wins_majority(self):
        # Low sims + low temp so the prior (not the search's own terminal
        # backups) decides endgames — at larger sims even uniform priors
        # find the immediate win and the margin vanishes.
        cfg = _cfg(Nim3)._replace(sims=2, arena_temp=0.25)
        arena = make_multi_arena_fn(
            Nim3, cfg, [_closer_apply, _uniform_apply, _uniform_apply],
            num_games=48)
        res = arena([{}, {}, {}], jax.random.PRNGKey(1))
        wins = np.asarray(res.model_wins)
        assert wins[0] > wins[1] and wins[0] > wins[2], wins
        assert wins[0] >= 24, wins  # strictly better than 1/3 share

    def test_num_games_divisibility_enforced(self):
        import pytest

        with pytest.raises(ValueError):
            make_multi_arena_fn(
                Nim3, _cfg(Nim3), [_uniform_apply] * 3, num_games=16,
            )([{}, {}, {}], jax.random.PRNGKey(0))


class _TTTNoAlt(TicTacToe):
    """TicTacToe flagged non-alternating → forces the evaluate-all path."""

    ALTERNATES = False


class TestGroupedEvalRouting:
    def test_grouped_matches_eval_all(self):
        """The grouped per-model routing must reproduce the evaluate-all
        fallback exactly (same models, same RNG → same games)."""

        def apply_a(variables, obs):
            B = obs.shape[0]
            center = jnp.array([0.4, 1, 0.4, 1, 3.0, 1, 0.4, 1, 0.4])
            logp = jnp.log(jnp.tile(center / center.sum(), (B, 1)))
            return logp, jnp.full((B, 3), -jnp.log(3.0))

        def apply_b(variables, obs):
            B = obs.shape[0]
            corner = jnp.array([3.0, 1, 3.0, 1, 0.4, 1, 3.0, 1, 3.0])
            logp = jnp.log(jnp.tile(corner / corner.sum(), (B, 1)))
            return logp, jnp.full((B, 3), -jnp.log(3.0))

        rng = jax.random.PRNGKey(7)
        res_grouped = make_arena_fn(
            TicTacToe, _cfg(TicTacToe), apply_a, 16, apply_fn_b=apply_b
        )({}, {}, rng)
        res_all = make_arena_fn(
            _TTTNoAlt, _cfg(TicTacToe), apply_a, 16, apply_fn_b=apply_b
        )({}, {}, rng)
        np.testing.assert_array_equal(
            np.asarray(res_grouped.model_wins), np.asarray(res_all.model_wins))
        assert float(res_grouped.draws) == float(res_all.draws)
        np.testing.assert_allclose(
            float(res_grouped.avg_game_length), float(res_all.avg_game_length))


class TestAlternationContract:
    @pytest.mark.slow
    def test_all_registered_envs_alternate(self):
        """Every built-in env must keep player == turns % N (the arena's
        grouped-eval precondition, Env.ALTERNATES)."""
        rng = np.random.default_rng(0)
        for name in list_envs():
            env = get_env(name)
            if not env.ALTERNATES:
                continue
            step = jax.jit(env.step)
            valid = jax.jit(env.valid_moves)
            win = jax.jit(env.win_state)
            s = env.init()
            for _ in range(6):
                if np.any(np.asarray(win(s)) > 0):
                    break
                v = np.asarray(valid(s))
                if not v.any():
                    break
                a = int(rng.choice(np.nonzero(v)[0]))
                s = step(s, a)
                assert (int(s.player)
                        == int(s.turns) % env.NUM_PLAYERS), name
