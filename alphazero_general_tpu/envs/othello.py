"""Othello 8x8 — vectorized JAX rules kernel.

Parity with the reference env (reference: alphazero/envs/othello/othello.pyx:
17-120, OthelloLogic.pyx:28-198), re-designed for TPU: the reference's
per-square flip scans become direction-shift mask propagation (6 bounded
steps per direction), so legal-move masks and flip execution are pure
vector ops over the whole board — and over thousands of boards under vmap.

Reference semantics kept exactly:
* action space is the 64 squares — **no pass action**; the game ends the
  moment the player to move has no legal move, scored by piece difference
  (othello.pyx:85-97);
* initial center: +1 at (n/2-1, n/2), (n/2, n/2-1); -1 at the other two
  (OthelloLogic.pyx:43-46); player 0 plays +1;
* observation: single raw board plane (othello.pyx:99-100);
* 8-fold dihedral symmetries (othello.pyx:102-120).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

N = 8
NUM_PLAYERS = 2
ACTION_SIZE = N * N
MAX_TURNS = N * N

# 8 directions as (dr, dc).
DIRECTIONS = [(1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1),
              (0, 1)]


@struct.dataclass
class OthelloState:
    board: jnp.ndarray  # int8[N, N]; +1 = player 0, -1 = player 1
    player: jnp.ndarray
    turns: jnp.ndarray
    last_action: jnp.ndarray


def _shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift a 2D mask by (dr, dc), zero-filling edges: out[r+dr, c+dc] = x[r, c]."""
    zero = jnp.zeros((), x.dtype)
    out = jnp.roll(x, (dr, dc), axis=(0, 1))
    if dr > 0:
        out = out.at[:dr, :].set(zero)
    elif dr < 0:
        out = out.at[dr:, :].set(zero)
    if dc > 0:
        out = out.at[:, :dc].set(zero)
    elif dc < 0:
        out = out.at[:, dc:].set(zero)
    return out


def _legal_mask(board: jnp.ndarray, piece: jnp.ndarray) -> jnp.ndarray:
    """bool[N, N] legal placements for ``piece`` via chain propagation."""
    own = board == piece
    opp = board == -piece
    empty = board == 0
    legal = jnp.zeros((N, N), jnp.bool_)
    for dr, dc in DIRECTIONS:
        chain = _shift(own, dr, dc) & opp
        for _ in range(N - 3):
            chain = chain | (_shift(chain, dr, dc) & opp)
        legal = legal | (_shift(chain, dr, dc) & empty)
    return legal


def _flips_for(board: jnp.ndarray, piece: jnp.ndarray,
               placed: jnp.ndarray) -> jnp.ndarray:
    """bool[N, N] opponent pieces flipped by placing ``piece`` at mask
    ``placed`` (a one-hot board mask)."""
    own = board == piece
    opp = board == -piece
    total = jnp.zeros((N, N), jnp.bool_)
    for dr, dc in DIRECTIONS:
        chain = _shift(placed, dr, dc) & opp
        for _ in range(N - 3):
            chain = chain | (_shift(chain, dr, dc) & opp)
        # The chain captures iff the cell beyond its tip is our own piece.
        closed = jnp.any(_shift(chain, dr, dc) & own)
        total = total | (chain & closed)
    return total


class Othello(Env):
    NAME = "othello"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = ACTION_SIZE
    OBS_SHAPE = (1, N, N)
    MAX_TURNS = MAX_TURNS
    HAS_DRAW = True
    NUM_SYMMETRIES = 8

    State = OthelloState

    @staticmethod
    def init() -> OthelloState:
        board = jnp.zeros((N, N), jnp.int8)
        h = N // 2
        board = board.at[h - 1, h].set(1).at[h, h - 1].set(1)
        board = board.at[h - 1, h - 1].set(-1).at[h, h].set(-1)
        return OthelloState(
            board=board,
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def _piece(player) -> jnp.ndarray:
        return jnp.where(player == 0, jnp.int8(1), jnp.int8(-1))

    @staticmethod
    def step(state: OthelloState, action) -> OthelloState:
        action = jnp.asarray(action, jnp.int32)
        r, c = action // N, action % N
        piece = Othello._piece(state.player)
        placed = jnp.zeros((N, N), jnp.bool_).at[r, c].set(True)
        flips = _flips_for(state.board, piece, placed)
        board = jnp.where(flips | placed, piece, state.board).astype(jnp.int8)
        return OthelloState(
            board=board,
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=action,
        )

    @staticmethod
    def valid_moves(state: OthelloState) -> jnp.ndarray:
        piece = Othello._piece(state.player)
        return _legal_mask(state.board, piece).reshape(-1)

    @staticmethod
    def win_state(state: OthelloState) -> jnp.ndarray:
        # Terminal iff the player to move has no legal move
        # (othello.pyx:85-97); winner by piece difference.
        piece = Othello._piece(state.player)
        no_moves = ~jnp.any(_legal_mask(state.board, piece))
        diff = jnp.sum(state.board.astype(jnp.int32)) * jnp.where(
            piece > 0, 1, -1
        )
        me = state.player
        opp = (state.player + 1) % NUM_PLAYERS
        result = jnp.zeros((3,), jnp.float32)
        result = result.at[me].set(jnp.where(no_moves & (diff > 0), 1.0, 0.0))
        result = result.at[opp].set(jnp.where(no_moves & (diff < 0), 1.0, 0.0))
        result = result.at[2].set(jnp.where(no_moves & (diff == 0), 1.0, 0.0))
        return result

    @staticmethod
    def observation(state: OthelloState) -> jnp.ndarray:
        return state.board.astype(jnp.float32)[None]

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

    @staticmethod
    def crude_value(state: OthelloState) -> jnp.ndarray:
        """Piece-difference heuristic in [0, 1] from the mover's view."""
        piece = Othello._piece(state.player).astype(jnp.int32)
        diff = jnp.sum(state.board.astype(jnp.int32)) * piece
        return 0.5 + 0.5 * jnp.tanh(diff / 16.0)

    @classmethod
    def display(cls, state: OthelloState) -> str:
        chars = {0: ".", 1: "W", -1: "b"}
        board = np.asarray(state.board)
        return "\n".join(" ".join(chars[int(v)] for v in row) for row in board)


Game = Othello
