"""Host-stepped arena driver (ArenaConfig.host_loop) — bit-equality with
the fused lax.while_loop driver.

The fused whole-game arena program crashes the TPU worker at large
sims x tower scale (observed: hnefatafl, 250 sims, 128ch x 10 — the same
move as a standalone jitted program runs fine). The host-stepped driver
replays the exact RNG split sequence of the fused driver, so both must
produce identical games.
"""

import jax
import numpy as np

from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.selfplay.arena import (
    ArenaConfig, play_games, raw_mcts_apply,
)


def _uniform_apply(action_size, value_size):
    return raw_mcts_apply(action_size, value_size)


def test_host_loop_bit_equal_fused():
    env = get_env("tictactoe")
    vsize = env.NUM_PLAYERS + int(env.HAS_DRAW)
    apply_a = _uniform_apply(env.ACTION_SIZE, vsize)
    # A second, genuinely different "model": peaked priors on low actions.
    import jax.numpy as jnp

    def apply_b(variables, obs):
        B = obs.shape[0]
        logits = -0.3 * jnp.arange(env.ACTION_SIZE, dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits)
        return jnp.broadcast_to(logp, (B, env.ACTION_SIZE)), jnp.full(
            (B, vsize), -jnp.log(float(vsize)))

    results = {}
    for host_loop in (False, True):
        cfg = ArenaConfig(
            sims=12, host_loop=host_loop,
            spec=ArenaConfig().spec._replace(
                num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW))
        res = play_games(env, cfg, apply_a, {}, {}, 8,
                         jax.random.PRNGKey(3), apply_fn_b=apply_b)
        results[host_loop] = res
    a, b = results[False], results[True]
    np.testing.assert_array_equal(np.asarray(a.model_wins),
                                  np.asarray(b.model_wins))
    np.testing.assert_array_equal(np.asarray(a.draws), np.asarray(b.draws))
    np.testing.assert_array_equal(np.asarray(a.avg_game_length),
                                  np.asarray(b.avg_game_length))


def test_host_loop_from_args():
    from alphazero_general_tpu.utils.config import get_args

    args = get_args(arenaHostLoop=True)
    cfg = ArenaConfig.from_args(args, 2, True)
    assert cfg.host_loop is True
    cfg2 = ArenaConfig.from_args(get_args(), 2, True)
    assert cfg2.host_loop is False
