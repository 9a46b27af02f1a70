"""Gobang (Gomoku) 15x15, five-in-row — vectorized JAX rules kernel.

Parity with the reference env (reference: alphazero/envs/gobang/gobang.pyx:
25-32, GobangLogic.pyx): free placement on empty cells, win = 5 in a row in
any direction, draw on a full board; 4-plane observation like connect4
(players, colour, turn fraction); 8-fold dihedral symmetries.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

N = 15
N_IN_ROW = 5
NUM_PLAYERS = 2
ACTION_SIZE = N * N
MAX_TURNS = N * N
NUM_CHANNELS = 4


@struct.dataclass
class GobangState:
    board: jnp.ndarray  # int8[N, N]
    player: jnp.ndarray
    turns: jnp.ndarray
    last_action: jnp.ndarray


def _five_hits(b: jnp.ndarray) -> jnp.ndarray:
    k = N_IN_ROW
    horiz = b[:, : -(k - 1)]
    vert = b[: -(k - 1), :]
    diag1 = b[: -(k - 1), : -(k - 1)]
    diag2 = b[(k - 1):, : -(k - 1)]
    for i in range(1, k):
        horiz = horiz & b[:, i : N - k + 1 + i]
        vert = vert & b[i : N - k + 1 + i, :]
        diag1 = diag1 & b[i : N - k + 1 + i, i : N - k + 1 + i]
        diag2 = diag2 & b[k - 1 - i : N - i, i : N - k + 1 + i]
    return horiz.any() | vert.any() | diag1.any() | diag2.any()


class Gobang(Env):
    NAME = "gobang"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = ACTION_SIZE
    OBS_SHAPE = (NUM_CHANNELS, N, N)
    MAX_TURNS = MAX_TURNS
    HAS_DRAW = True
    NUM_SYMMETRIES = 8

    State = GobangState

    @staticmethod
    def init() -> GobangState:
        return GobangState(
            board=jnp.zeros((N, N), jnp.int8),
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def step(state: GobangState, action) -> GobangState:
        action = jnp.asarray(action, jnp.int32)
        r, c = action // N, action % N
        piece = jnp.where(state.player == 0, jnp.int8(1), jnp.int8(-1))
        return GobangState(
            board=state.board.at[r, c].set(piece),
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=action,
        )

    @staticmethod
    def valid_moves(state: GobangState) -> jnp.ndarray:
        return (state.board == 0).reshape(-1)

    @staticmethod
    def win_state(state: GobangState) -> jnp.ndarray:
        p0 = _five_hits(state.board == 1)
        p1 = _five_hits(state.board == -1) & ~p0
        draw = jnp.all(state.board != 0) & ~p0 & ~p1
        return jnp.stack([p0, p1, draw]).astype(jnp.float32)

    @staticmethod
    def observation(state: GobangState) -> jnp.ndarray:
        b = state.board
        p0 = (b == 1).astype(jnp.float32)
        p1 = (b == -1).astype(jnp.float32)
        colour = jnp.full((N, N), state.player, dtype=jnp.float32)
        turn = jnp.full((N, N), state.turns / MAX_TURNS, dtype=jnp.float32)
        return jnp.stack([p0, p1, colour, turn])

    @staticmethod
    def crude_value(state: GobangState) -> jnp.ndarray:
        """Mover-perspective heuristic for greedy baselines (reference
        pattern: envs/brandubh/fastafl.pyx:258-268): 1/0 on a decided game,
        else 0.5 — one-ply search over it takes wins and blocks losses."""
        w = Gobang.win_state(state)
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
    def display(cls, state: GobangState) -> str:
        chars = {0: ".", 1: "X", -1: "O"}
        board = np.asarray(state.board)
        return "\n".join(" ".join(chars[int(v)] for v in row) for row in board)


Game = Gobang
