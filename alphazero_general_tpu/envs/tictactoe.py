"""TicTacToe — minimal pure-JAX example env.

Parity with the reference's pure-Python example env (reference:
alphazero/envs/tictactoe/tictactoe.py:15-102, TicTacToeLogic.py). 8-fold
dihedral symmetry expansion is expressed as stacked rot/flip array ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

N = 3
NUM_PLAYERS = 2
ACTION_SIZE = N * N
MAX_TURNS = N * N


@struct.dataclass
class TicTacToeState:
    board: jnp.ndarray  # int8[N, N]; +1 = player 0, -1 = player 1
    player: jnp.ndarray
    turns: jnp.ndarray
    last_action: jnp.ndarray


class TicTacToe(Env):
    NAME = "tictactoe"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = ACTION_SIZE
    OBS_SHAPE = (1, N, N)
    MAX_TURNS = MAX_TURNS
    HAS_DRAW = True
    NUM_SYMMETRIES = 8

    State = TicTacToeState

    @staticmethod
    def init() -> TicTacToeState:
        return TicTacToeState(
            board=jnp.zeros((N, N), dtype=jnp.int8),
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def step(state: TicTacToeState, action) -> TicTacToeState:
        action = jnp.asarray(action, jnp.int32)
        r, c = action // N, action % N
        piece = jnp.where(state.player == 0, jnp.int8(1), jnp.int8(-1))
        return TicTacToeState(
            board=state.board.at[r, c].set(piece),
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=action,
        )

    @staticmethod
    def valid_moves(state: TicTacToeState) -> jnp.ndarray:
        return (state.board == 0).reshape(-1)

    @staticmethod
    def win_state(state: TicTacToeState) -> jnp.ndarray:
        def wins(piece):
            b = state.board == piece
            rows = jnp.any(jnp.all(b, axis=1))
            cols = jnp.any(jnp.all(b, axis=0))
            d1 = jnp.all(jnp.diagonal(b))
            d2 = jnp.all(jnp.diagonal(b[:, ::-1]))
            return rows | cols | d1 | d2

        p0 = wins(jnp.int8(1))
        p1 = wins(jnp.int8(-1)) & ~p0
        draw = jnp.all(state.board != 0) & ~p0 & ~p1
        return jnp.stack([p0, p1, draw]).astype(jnp.float32)

    @staticmethod
    def observation(state: TicTacToeState) -> jnp.ndarray:
        return state.board.astype(jnp.float32)[None]

    @staticmethod
    def crude_value(state: TicTacToeState) -> jnp.ndarray:
        """Mover-perspective heuristic for greedy baselines: 1/0 on a
        decided game, else 0.5 (reference pattern:
        envs/brandubh/fastafl.pyx:258-268)."""
        w = TicTacToe.win_state(state)
        me = w[state.player]
        opp = w[(state.player + 1) % NUM_PLAYERS]
        return jnp.where(me > 0, 1.0, jnp.where(opp > 0, 0.0, 0.5))

    @classmethod
    def symmetries(cls, obs: jnp.ndarray, pi: jnp.ndarray):
        pi_b = pi.reshape(N, N)
        obs_list, pi_list = [], []
        for rot in range(4):
            for flip in (False, True):
                o = jnp.rot90(obs, rot, axes=(1, 2))
                p = jnp.rot90(pi_b, rot)
                if flip:
                    o = o[:, :, ::-1]
                    p = p[:, ::-1]
                obs_list.append(o)
                pi_list.append(p.reshape(-1))
        return jnp.stack(obs_list), jnp.stack(pi_list)

    @classmethod
    def display(cls, state: TicTacToeState) -> str:
        chars = {0: ".", 1: "O", -1: "X"}
        board = np.asarray(state.board)
        return "\n".join(" ".join(chars[int(v)] for v in row) for row in board)


Game = TicTacToe
