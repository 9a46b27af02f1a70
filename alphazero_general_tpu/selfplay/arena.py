"""Batched two-model arena — jitted model comparison.

Replaces the reference Arena (reference: alphazero/Arena.pyx:58-376): instead
of re-using the multiprocess self-play agents with per-player batch queues
(the path flagged in-code as ~10x slower than self-play, Arena.pyx:209), both
models are resident on device and every move round evaluates the whole game
batch under jit — per-game seat assignment selects which model's output to
use. As in the reference batched arena, the model of the player to move at the
*root* evaluates that game's entire search for the move
(SelfPlayAgent.pyx:117-121), no root noise / no root temperature is applied
(SelfPlayAgent.pyx:148-151), and the move temperature is args.arenaTemp
(SelfPlayAgent.pyx:156-158).

Seats alternate across the batch (first half straight, second half swapped),
the vectorized equivalent of the reference's per-worker seat shuffle
(SelfPlayAgent.pyx:44-47) / sequential alternation (Arena.pyx:332-337).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T


class ArenaConfig(NamedTuple):
    sims: int = 100  # numMCTSSims (arena uses full sims; arenaMCTS=True)
    arena_temp: float = 0.25  # arenaTemp
    tree_capacity: int = 0
    spec: T.SearchSpec = T.SearchSpec(add_root_noise=False, add_root_temp=False)

    @property
    def capacity(self) -> int:
        return self.tree_capacity or self.sims + 2

    @classmethod
    def from_args(cls, args, num_players: int, has_draw: bool) -> "ArenaConfig":
        spec = T.SearchSpec(
            cpuct=float(args.cpuct),
            fpu_reduction=float(args.fpu_reduction),
            min_discount=float(args.min_discount),
            add_root_noise=False,
            add_root_temp=False,
            num_players=num_players,
            has_draw=has_draw,
        )
        return cls(
            sims=int(args.numMCTSSims),
            arena_temp=float(args.arenaTemp),
            tree_capacity=int(args.get("max_tree_nodes", 0)),
            spec=spec,
        )


@struct.dataclass
class ArenaResult:
    """Per-game outcome, seat-remapped to model indices."""

    model_wins: jnp.ndarray  # f32[2]
    draws: jnp.ndarray  # f32
    avg_game_length: jnp.ndarray  # f32
    num_games: jnp.ndarray  # i32


def play_games(env, cfg: ArenaConfig, apply_fn, variables_a, variables_b,
               num_games: int, rng, apply_fn_b=None):
    """Play ``num_games`` games of model A vs model B; returns ArenaResult.

    Half the games have A as player 0, half B (num_games must be even).
    Jittable end-to-end; callers typically wrap in jax.jit via
    :func:`make_arena_fn`. ``apply_fn_b`` lets model B use a different
    apply function (e.g. the model-free RawMCTS baseline,
    GenericPlayers.py:198-200).
    """
    B = num_games
    apply_b = apply_fn_b or apply_fn
    seat = (jnp.arange(B) >= B // 2).astype(jnp.int32)  # 0: A first, 1: B first
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    value_size = cfg.spec.value_size

    def eval_both(obs, model_idx):
        """Evaluate obs with both models, select per game by model_idx."""
        pa, va = apply_fn(variables_a, obs)
        pb, vb = apply_b(variables_b, obs)
        sel = (model_idx == 0)[:, None]
        pi = jnp.where(sel, jnp.exp(pa), jnp.exp(pb))
        v = jnp.where(sel, jnp.exp(va), jnp.exp(vb))
        return pi, v

    def cond(carry):
        states, done, result, length, t, rng = carry
        return (~jnp.all(done)) & (t < env.MAX_TURNS)

    def body(carry):
        states, done, result, length, t, rng = carry
        rng, r_search, r_action = jax.random.split(rng, 3)

        model_idx = (states.player + seat) % 2  # model evaluating each game

        trees = S.init_batched_trees(env, states, cfg.capacity, value_size)
        trees = S.search(
            env, trees, cfg.spec,
            lambda obs: eval_both(obs, model_idx),
            cfg.sims, r_search,
        )
        pi = jax.vmap(lambda tr: T.probs(tr, cfg.arena_temp))(trees)
        action = jax.random.categorical(
            r_action, jnp.log(jnp.maximum(pi, 1e-30)), axis=-1
        ).astype(jnp.int32)

        stepped = jax.vmap(env.step)(states, action)
        def _sel(new, old):
            d = done.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(d, old, new)
        new_states = jax.tree_util.tree_map(_sel, stepped, states)

        win = jax.vmap(env.win_state)(new_states)
        now_done = jnp.any(win > 0, axis=-1) & ~done
        result = jnp.where(now_done[:, None], win, result)
        length = jnp.where(now_done, t + 1, length)
        done = done | now_done
        return new_states, done, result, length, t + 1, rng

    init = (
        states,
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B, value_size), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.int32(0),
        rng,
    )
    states, done, result, length, t, rng = jax.lax.while_loop(cond, body, init)

    # Seat remap: player p of game b is model (p + seat[b]) % 2
    # (reference: player_to_index remap, Arena.pyx:291-299, utils.py:34-54).
    win_p0 = result[:, 0]
    win_p1 = result[:, 1]
    draws = result[:, 2] if value_size > 2 else jnp.zeros((B,))
    a_wins = jnp.sum(jnp.where(seat == 0, win_p0, win_p1))
    b_wins = jnp.sum(jnp.where(seat == 0, win_p1, win_p0))
    return ArenaResult(
        model_wins=jnp.stack([a_wins, b_wins]),
        draws=jnp.sum(draws),
        avg_game_length=jnp.mean(length.astype(jnp.float32)),
        num_games=jnp.int32(B),
    )


def make_arena_fn(env, cfg: ArenaConfig, apply_fn, num_games: int,
                  apply_fn_b=None):
    """Jitted arena bound to model apply function(s); params are runtime args."""

    def run(variables_a, variables_b, rng):
        return play_games(env, cfg, apply_fn, variables_a, variables_b,
                          num_games, rng, apply_fn_b=apply_fn_b)

    return jax.jit(run)


def raw_mcts_apply(action_size: int, value_size: int):
    """Apply fn of the RawMCTS baseline: uniform priors, (near-)zero values
    (reference: GenericPlayers.py:198-200 — raw_search semantics)."""

    def apply(variables, obs):
        B = obs.shape[0]
        logp = jnp.full((B, action_size), -jnp.log(float(action_size)))
        logv = jnp.full((B, value_size), -100.0)
        return logp, logv

    return apply


def winrates(result: ArenaResult, use_draws: bool = True):
    """Per-model winrate with half-credit draws
    (reference: Arena.pyx:19-36 _PlayerStats, Coach.py:393-396)."""
    n = jnp.maximum(result.num_games.astype(jnp.float32), 1.0)
    draw_credit = 0.5 * result.draws if use_draws else 0.0
    return (result.model_wins + draw_credit) / n
