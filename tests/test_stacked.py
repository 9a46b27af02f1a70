"""Observation-stacking wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.envs.stacked import make_stacked_env, maybe_stack
from alphazero_general_tpu.utils.config import get_args

C4x3 = make_stacked_env(Connect4, 3)


class TestStacked:
    def test_shapes(self):
        assert C4x3.OBS_SHAPE == (12, 6, 7)
        s = C4x3.init()
        obs = np.asarray(C4x3.observation(s))
        assert obs.shape == (12, 6, 7)
        # No history yet: past frames are zero planes.
        assert np.all(obs[4:] == 0)

    def test_history_rolls(self):
        s0 = C4x3.init()
        o0 = np.asarray(Connect4.observation(s0.inner))
        s1 = C4x3.step(s0, 3)
        o1 = np.asarray(Connect4.observation(s1.inner))
        s2 = C4x3.step(s1, 4)

        obs2 = np.asarray(C4x3.observation(s2))
        np.testing.assert_array_equal(obs2[4:8], o1)   # one move ago
        np.testing.assert_array_equal(obs2[8:12], o0)  # two moves ago

    def test_rules_delegate(self):
        s = C4x3.init()
        for m in [2, 0, 3, 0, 4, 0, 5]:
            s = C4x3.step(s, m)
        np.testing.assert_array_equal(
            np.asarray(C4x3.win_state(s)), [1, 0, 0]
        )
        assert int(s.turns) == 7

    def test_symmetries(self):
        s = C4x3.step(C4x3.init(), 1)
        obs = C4x3.observation(s)
        pi = jnp.arange(7, dtype=jnp.float32)
        obs_k, pi_k = C4x3.symmetries(obs, pi)
        assert obs_k.shape == (2, 12, 6, 7)
        np.testing.assert_array_equal(
            np.asarray(obs_k[1]), np.asarray(obs)[:, :, ::-1]
        )
        np.testing.assert_array_equal(np.asarray(pi_k[1]),
                                      np.arange(7)[::-1])

    def test_vmap_jit(self):
        B = 8
        states = jax.vmap(lambda _: C4x3.init())(jnp.arange(B))
        step = jax.jit(jax.vmap(C4x3.step))
        states = step(states, jnp.arange(B) % 7)
        assert states.past_obs.shape == (B, 2, 4, 6, 7)

    def test_maybe_stack(self):
        assert maybe_stack(Connect4, get_args()) is Connect4
        wrapped = maybe_stack(Connect4, get_args(num_stacked_observations=2))
        assert wrapped.OBS_SHAPE == (8, 6, 7)

    def test_selfplay_smoke(self):
        import alphazero_general_tpu.mcts.tree as T
        from alphazero_general_tpu.selfplay import (
            SelfPlayConfig, init_selfplay, play_chunk,
        )
        import alphazero_general_tpu.mcts.search as S

        env = make_stacked_env(Connect4, 2)
        cfg = SelfPlayConfig(
            sims_full=6, sims_fast=3, sims_warmup=3, prob_fast=0.5,
            spec=T.SearchSpec(num_players=2, has_draw=True),
        )
        carry = init_selfplay(env, 4, 1.0)
        carry, rec = jax.jit(
            lambda c, r: play_chunk(env, cfg, None, c, r, 6, warmup=True)
        )(carry, jax.random.PRNGKey(0))
        assert rec.obs.shape == (6, 4, 8, 6, 7)
