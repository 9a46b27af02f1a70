"""Nim3 — a 3-player counting game exercising N-player support end-to-end.

The reference advertises N-player games as a first-class capability
(reference: README.md:16; Arena.pyx takes a players list and win vectors are
``num_players + 1`` long) but ships no env with more than two players; this
env closes that gap and is the coverage vehicle for the N-model arena
(selfplay/arena.py), the N-slot value head and the generic seat-rotation /
win-credit math.

Rules: a pile starts at ``PILE`` tokens; players move in fixed rotation,
each removing 1..3 tokens; whoever takes the last token wins (the other two
players lose). No draws can occur (the pile strictly decreases), but the
draw slot is kept in the win vector per the framework convention
(alphazero/Game.py:86-93).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

PILE = 15
NUM_PLAYERS = 3
MAX_TAKE = 3


@struct.dataclass
class Nim3State:
    pile: jnp.ndarray  # int32 scalar, tokens remaining
    player: jnp.ndarray
    turns: jnp.ndarray
    last_action: jnp.ndarray


class Nim3(Env):
    NAME = "nim3"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = MAX_TAKE
    OBS_SHAPE = (1 + NUM_PLAYERS, 1, PILE + 1)
    MAX_TURNS = PILE
    HAS_DRAW = True  # never occurs; slot kept per framework convention
    NUM_SYMMETRIES = 1

    State = Nim3State

    @staticmethod
    def init() -> Nim3State:
        return Nim3State(
            pile=jnp.int32(PILE),
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def step(state: Nim3State, action) -> Nim3State:
        take = jnp.asarray(action, jnp.int32) + 1
        return Nim3State(
            pile=jnp.maximum(state.pile - take, 0),
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=jnp.asarray(action, jnp.int32),
        )

    @staticmethod
    def valid_moves(state: Nim3State) -> jnp.ndarray:
        return jnp.arange(MAX_TAKE) + 1 <= state.pile

    @staticmethod
    def win_state(state: Nim3State) -> jnp.ndarray:
        ended = state.pile == 0
        winner = (state.player - 1) % NUM_PLAYERS  # who just moved
        w = jnp.where(
            ended, jnp.arange(NUM_PLAYERS) == winner,
            jnp.zeros((NUM_PLAYERS,), jnp.bool_),
        )
        return jnp.concatenate(
            [w, jnp.zeros((1,), jnp.bool_)]).astype(jnp.float32)

    @staticmethod
    def observation(state: Nim3State) -> jnp.ndarray:
        pile_plane = (jnp.arange(PILE + 1) == state.pile).astype(jnp.float32)
        player_planes = (
            jnp.arange(NUM_PLAYERS)[:, None] == state.player
        ).astype(jnp.float32) * jnp.ones((NUM_PLAYERS, PILE + 1))
        return jnp.concatenate(
            [pile_plane[None], player_planes], axis=0)[:, None, :]

    @classmethod
    def display(cls, state: Nim3State) -> str:
        return (f"pile={int(np.asarray(state.pile))} "
                f"to-move=P{int(np.asarray(state.player))}")


Game = Nim3
