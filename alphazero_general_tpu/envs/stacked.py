"""Observation history stacking — generic wrapper.

The reference declares ``num_stacked_observations`` (Coach.py:53) but only
wires it in the legacy tafl adapter via engine-side past-state rings
(tafl_old.pyx:12-18, 97-106; scaffolded in the fastafl adapters). Here it is
a generic env transform: the state carries the last k-1 observations and the
observation is their channel concatenation [k*C, H, W], newest first, zero
planes before the game has history (matching _get_observation's empty-plane
padding, envs/brandubh/fastafl.pyx:106-121).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from alphazero_general_tpu.envs.core import Env


@struct.dataclass
class StackedState:
    inner: object  # base env state
    past_obs: jnp.ndarray  # f32[k-1, C, H, W], newest first
    # mirrored base fields so generic code (players, selfplay) keeps working
    player: jnp.ndarray
    turns: jnp.ndarray
    last_action: jnp.ndarray


def make_stacked_env(base: type, k: int) -> type:
    """Wrap ``base`` so observations stack the last ``k`` frames."""
    assert k >= 2, "use the base env for k == 1"
    C, H, W = base.OBS_SHAPE

    class Stacked(Env):
        NAME = f"{base.NAME}_x{k}"
        NUM_PLAYERS = base.NUM_PLAYERS
        ACTION_SIZE = base.ACTION_SIZE
        OBS_SHAPE = (C * k, H, W)
        MAX_TURNS = base.MAX_TURNS
        HAS_DRAW = base.HAS_DRAW
        NUM_SYMMETRIES = base.NUM_SYMMETRIES
        BASE = base
        STACK = k

        State = StackedState

        @staticmethod
        def init() -> StackedState:
            inner = base.init()
            return StackedState(
                inner=inner,
                past_obs=jnp.zeros((k - 1, C, H, W), jnp.float32),
                player=inner.player,
                turns=inner.turns,
                last_action=inner.last_action,
            )

        @staticmethod
        def step(state: StackedState, action) -> StackedState:
            cur = base.observation(state.inner)
            new_inner = base.step(state.inner, action)
            past = jnp.concatenate(
                [cur[None], state.past_obs[: k - 2]], axis=0
            ) if k > 2 else cur[None]
            return StackedState(
                inner=new_inner,
                past_obs=past,
                player=new_inner.player,
                turns=new_inner.turns,
                last_action=new_inner.last_action,
            )

        @staticmethod
        def valid_moves(state):
            return base.valid_moves(state.inner)

        @staticmethod
        def win_state(state):
            return base.win_state(state.inner)

        @staticmethod
        def observation(state):
            cur = base.observation(state.inner)
            return jnp.concatenate(
                [cur[None], state.past_obs], axis=0
            ).reshape(k * C, H, W)

        @classmethod
        def symmetries(cls, obs, pi):
            # Apply the base env's (purely spatial) transforms per frame:
            # transform the stacked planes as one [k*C, H, W] block by
            # delegating each frame through the base symmetry function.
            frames = obs.reshape(k, C, H, W)
            outs = None
            pi_k = None
            for f in range(k):
                obs_f, pi_f = base.symmetries(frames[f], pi)
                if outs is None:
                    outs = [obs_f]
                    pi_k = pi_f
                else:
                    outs.append(obs_f)
            stacked = jnp.concatenate(outs, axis=1)  # [S, k*C, H, W]
            return stacked, pi_k

        @staticmethod
        def crude_value(state):
            return base.crude_value(state.inner)

        @classmethod
        def display(cls, state):
            return base.display(state.inner)

    Stacked.__name__ = f"{base.__name__}X{k}"
    return Stacked


def maybe_stack(env: type, args) -> type:
    """Apply args.num_stacked_observations if > 1 (Coach.py:53)."""
    k = int(args.get("num_stacked_observations", 1) or 1)
    return make_stacked_env(env, k) if k > 1 else env
