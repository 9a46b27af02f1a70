"""Environment kernel API — the TPU-native replacement for the reference's
`GameState` ABC (reference: alphazero/Game.py:7-113) and Cython board engines.

Design: an environment is a *class of pure static functions* over an immutable
state pytree (a `flax.struct` dataclass of JAX arrays). Every function operates
on a **single unbatched state** and must be `jit`/`vmap`-safe (static shapes,
no data-dependent Python control flow); callers batch thousands of boards in
lockstep with `jax.vmap`, which is how the reference's per-process game vectors
(SelfPlayAgent.pyx:103-135) become a single SPMD program.

Contract (mirrors the reference API surface 1:1 where it makes sense):

=====================  ======================================================
reference              here
=====================  ======================================================
``clone()``            unnecessary — states are immutable pytrees
``action_size()``      class attr ``ACTION_SIZE``
``observation_size()`` class attr ``OBS_SHAPE`` = (C, H, W)
``num_players()``      class attr ``NUM_PLAYERS``
``max_turns()``        class attr ``MAX_TURNS``
``has_draw()``         class attr ``HAS_DRAW``
``valid_moves()``      ``valid_moves(state) -> bool[ACTION_SIZE]``
``play_action(a)``     ``step(state, action) -> state``
``win_state()``        ``win_state(state) -> float32[NUM_PLAYERS + 1]``
``observation()``      ``observation(state) -> float32[C, H, W]``
``symmetries(pi)``     ``symmetries(obs, pi) -> (obs[K,...], pi[K, A])``
=====================  ======================================================

``win_state`` keeps the reference's convention: one slot per player set to 1.0
on a win, the final slot set to 1.0 on a draw, all-zeros while the game is
running (alphazero/Game.py:86-93).
"""

from __future__ import annotations

from typing import Tuple, Type

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Base fields shared by all env states.

    ``player``/``turns`` mirror the reference GameState properties
    (alphazero/Game.py:65-71); ``last_action`` mirrors Game.py:84.
    """

    player: jnp.ndarray  # int32 scalar, 0..NUM_PLAYERS-1
    turns: jnp.ndarray  # int32 scalar
    last_action: jnp.ndarray  # int32 scalar, -1 before the first move


class Env:
    """Static-function environment. Subclasses override everything below."""

    NAME: str = "env"
    NUM_PLAYERS: int = 2
    ACTION_SIZE: int = 0
    OBS_SHAPE: Tuple[int, int, int] = (1, 1, 1)  # (C, H, W)
    MAX_TURNS: int = 0
    HAS_DRAW: bool = True
    #: number of symmetric copies returned by `symmetries` (1 = identity only)
    NUM_SYMMETRIES: int = 1
    #: True when ``step`` always advances ``player = (player + 1) % N`` (all
    #: built-in envs; passes are explicit actions). The batched arena relies
    #: on this to give each model exactly its own games' evaluations per move
    #: round (selfplay/arena.py); envs that ever skip a player's turn must
    #: set False to get the evaluate-all fallback.
    ALTERNATES: bool = True

    State: Type[EnvState] = EnvState

    # -- rules ---------------------------------------------------------------
    @staticmethod
    def init() -> EnvState:
        raise NotImplementedError

    @staticmethod
    def step(state: EnvState, action: jnp.ndarray) -> EnvState:
        """Apply ``action`` (assumed legal) and advance player/turn."""
        raise NotImplementedError

    @staticmethod
    def valid_moves(state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def win_state(state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def observation(state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    # -- optional ------------------------------------------------------------
    @classmethod
    def symmetries(cls, obs: jnp.ndarray, pi: jnp.ndarray):
        """Return stacked symmetric (obs, pi) copies; index 0 is the identity."""
        return obs[None], pi[None]

    @staticmethod
    def crude_value(state: EnvState) -> jnp.ndarray:
        """Cheap heuristic value in [0, 1] for greedy baselines (reference:
        envs/brandubh/fastafl.pyx:258-268). Optional."""
        raise NotImplementedError

    @classmethod
    def display(cls, state: EnvState) -> str:
        """Human-readable board string (reference: per-env ``display()``)."""
        return repr(state)

    # -- derived helpers (shared) --------------------------------------------
    @classmethod
    def terminated(cls, state: EnvState) -> jnp.ndarray:
        return jnp.any(cls.win_state(state) > 0)

    @classmethod
    def next_player(cls, player: jnp.ndarray, turns: int = 1) -> jnp.ndarray:
        return (player + turns) % cls.NUM_PLAYERS

    @classmethod
    def observation_tensor_spec(cls):
        return jax.ShapeDtypeStruct(cls.OBS_SHAPE, jnp.float32)
