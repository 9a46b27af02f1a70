"""Connect4 — vectorized JAX rules kernel.

Capability-parity with the reference env (reference:
alphazero/envs/connect4/connect4.pyx:11-108 and Connect4Logic.pyx:14-110),
re-designed for TPU: the board is an int8 tensor, stone drops and win checks
are branch-free array ops so thousands of boards step in lockstep under
`vmap`+`jit` instead of the reference's per-board Cython loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

HEIGHT = 6
WIDTH = 7
WIN_LENGTH = 4
NUM_PLAYERS = 2
MAX_TURNS = HEIGHT * WIDTH  # 42
MULTI_PLANE_OBSERVATION = True
NUM_CHANNELS = 4 if MULTI_PLANE_OBSERVATION else 1


@struct.dataclass
class Connect4State:
    # +1 = player 0 stones, -1 = player 1 stones, 0 = empty (row 0 is the top,
    # same orientation as the reference board).
    board: jnp.ndarray  # int8[HEIGHT, WIDTH]
    player: jnp.ndarray  # int32 scalar
    turns: jnp.ndarray  # int32 scalar
    last_action: jnp.ndarray  # int32 scalar


def _line_hits(b: jnp.ndarray) -> jnp.ndarray:
    """True iff the bool board ``b`` contains WIN_LENGTH in a row anywhere.

    Shifted-slice conjunctions replace the reference's O(H*W*L) scalar scans
    (Connect4Logic.pyx:60-103); XLA fuses these into a handful of vector ops.
    """
    k = WIN_LENGTH
    horiz = b[:, : -(k - 1)]
    vert = b[: -(k - 1), :]
    diag1 = b[: -(k - 1), : -(k - 1)]
    diag2 = b[(k - 1):, : -(k - 1)]
    for i in range(1, k):
        horiz = horiz & b[:, i : WIDTH - k + 1 + i]
        vert = vert & b[i : HEIGHT - k + 1 + i, :]
        diag1 = diag1 & b[i : HEIGHT - k + 1 + i, i : WIDTH - k + 1 + i]
        diag2 = diag2 & b[k - 1 - i : HEIGHT - i, i : WIDTH - k + 1 + i]
    return horiz.any() | vert.any() | diag1.any() | diag2.any()


class Connect4(Env):
    NAME = "connect4"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = WIDTH
    OBS_SHAPE = (NUM_CHANNELS, HEIGHT, WIDTH)
    MAX_TURNS = MAX_TURNS
    HAS_DRAW = True
    NUM_SYMMETRIES = 2  # identity + left/right mirror (connect4.pyx:96-99)

    State = Connect4State

    @staticmethod
    def init() -> Connect4State:
        return Connect4State(
            board=jnp.zeros((HEIGHT, WIDTH), dtype=jnp.int8),
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def step(state: Connect4State, action) -> Connect4State:
        action = jnp.asarray(action, jnp.int32)
        col = state.board[:, action]
        # Lowest empty row of the column: rows fill bottom-up, so the landing
        # row is (#filled cells above it) - 1 counted from the top:
        filled = jnp.sum(jnp.abs(col)).astype(jnp.int32)
        row = HEIGHT - 1 - filled
        piece = jnp.where(state.player == 0, jnp.int8(1), jnp.int8(-1))
        board = state.board.at[row, action].set(piece)
        return Connect4State(
            board=board,
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=action,
        )

    @staticmethod
    def valid_moves(state: Connect4State) -> jnp.ndarray:
        # Any empty cell in the top row (Connect4Logic.pyx:50-58).
        return state.board[0, :] == 0

    @staticmethod
    def win_state(state: Connect4State) -> jnp.ndarray:
        p0 = _line_hits(state.board == 1)
        p1 = _line_hits(state.board == -1)
        full = jnp.all(state.board[0, :] != 0)
        draw = full & ~p0 & ~p1
        return jnp.stack([p0, p1 & ~p0, draw]).astype(jnp.float32)

    @staticmethod
    def observation(state: Connect4State) -> jnp.ndarray:
        # 4 planes: player-0 stones, player-1 stones, colour-to-move, turn
        # fraction (connect4.pyx:84-91).
        b = state.board
        p0 = (b == 1).astype(jnp.float32)
        p1 = (b == -1).astype(jnp.float32)
        colour = jnp.full((HEIGHT, WIDTH), state.player, dtype=jnp.float32)
        turn = jnp.full((HEIGHT, WIDTH), state.turns / MAX_TURNS, dtype=jnp.float32)
        return jnp.stack([p0, p1, colour, turn])

    @classmethod
    def symmetries(cls, obs: jnp.ndarray, pi: jnp.ndarray):
        return (
            jnp.stack([obs, obs[:, :, ::-1]]),
            jnp.stack([pi, pi[::-1]]),
        )

    @staticmethod
    def crude_value(state: Connect4State) -> jnp.ndarray:
        """Win-probability-style heuristic for greedy baselines: 1/0 on a
        decided game from the mover's perspective, else 0.5."""
        w = Connect4.win_state(state)
        me = w[state.player]
        opp = w[(state.player + 1) % NUM_PLAYERS]
        return jnp.where(me > 0, 1.0, jnp.where(opp > 0, 0.0, 0.5))

    @classmethod
    def display(cls, state: Connect4State) -> str:
        chars = {0: ".", 1: "X", -1: "O"}
        board = np.asarray(state.board)
        rows = [" ".join(chars[int(v)] for v in row) for row in board]
        rows.append(" ".join(map(str, range(WIDTH))))
        return "\n".join(rows)


Game = Connect4  # reference-style module-level alias (connect4.pyx:20)
