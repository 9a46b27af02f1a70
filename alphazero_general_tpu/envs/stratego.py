"""Stratego (8x10, two-phase, imperfect information) — JAX rules kernel.

Parity with the reference env (reference: alphazero/envs/stratego/
engine.pyx:28-295, stratego.pyx:25-257):

* cell encoding kept: 0 empty, 13 lake, red pieces 1-12, blue +20,
  visible +100 (engine.pyx:28-47);
* two phases in one superset action space of 1280 (stratego.pyx:39-44):
  placement actions ``piece*80 + row*10 + col`` (piece 1..12) while pieces
  remain (red rows 0-2, blue rows 5-7, alternating turns), then tafl-style
  rook move encoding (16 move types per square);
* movement: one orthogonal step; scouts ride through empty cells and may
  capture at the first enemy (engine.pyx:159-169); bombs/flags immobile;
* combat (engine.pyx:232-250): flag → capture flags; bomb vs non-miner or
  equal ranks → both destroyed (bomb explosion recorded for the observation
  planes); lower rank loses unless spy-attacks-marshal. Note the reference's
  actual behavior — replicated here — is that a *miner attacking a bomb
  loses* (the miner-exception only skips the mutual-destruction branch, and
  3 < 11 then hits the defender-wins branch);
* visibility: combat survivors become visible (+100); the reference's
  __getitem__ strips visibility when a piece *moves*, so moving re-hides a
  revealed piece — replicated (engine.pyx:93-94, 291-295);
* win (engine.pyx:203-209): blue wins if red's flag is captured or red is
  stuck (checked first), red wins on the mirror condition; draw at 512 turns
  including the 60 placement turns (stratego.pyx:36, 221-222);
* observation: 30 planes (stratego.pyx:102-141) — presence x2, visible
  pieces 12x2 interleaved, exploded bombs x2, colour, turn;
* symmetries: identity + left/right mirror with policy re-encoding
  (stratego.pyx:238-257); the mirror permutation differs by phase, inferred
  from the turn plane (placement is always the first 60 turns).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_general_tpu.envs.core import Env
from alphazero_general_tpu.envs.tafl import _build_tables

H, W = 8, 10
NUM_PLAYERS = 2
NUM_PIECES = 12
TEAM_OFFSET = 20
VISIBLE_OFFSET = 100
LAKE = 13
SPY, SCOUT, MINER = 1, 2, 3
MARSHAL, BOMB, FLAG = 10, 11, 12
DRAW_MOVE_COUNT = 512
PLACEMENT_TURNS = 60

MT = W + H - 2  # 16
CELLS = H * W  # 80
ACTION_SIZE = max(W + H * W + NUM_PIECES * CELLS, CELLS * MT)  # 1280
NUM_CHANNELS = 30

# Piece counts per type 1..12 (engine.pyx:54-56); index 0 unused.
PIECE_COUNTS = np.zeros(NUM_PIECES + 1, np.int8)
for p, n in ((SPY, 1), (SCOUT, 5), (MINER, 4), (4, 2), (5, 2), (6, 3),
             (7, 3), (8, 2), (9, 1), (MARSHAL, 1), (FLAG, 1), (BOMB, 5)):
    PIECE_COUNTS[p] = n

_START = np.zeros((H, W), np.uint8)
for r in (3, 4):
    for c in (2, 3, 6, 7):
        _START[r, c] = LAKE

_, DEST_R, DEST_C, BETWEEN, DEST_OH = _build_tables(H, W)
DIST = np.abs(DEST_R - np.arange(H)[:, None, None]) + \
    np.abs(DEST_C - np.arange(W)[None, :, None])  # [H, W, MT]

_between_j = jnp.asarray(BETWEEN)  # [CELLS*MT, CELLS]
_dest_oh_j = jnp.asarray(DEST_OH)
_dest_r_j = jnp.asarray(DEST_R.reshape(-1))
_dest_c_j = jnp.asarray(DEST_C.reshape(-1))
_dist1_j = jnp.asarray((DIST == 1).reshape(-1))

# Placement action index grid: PLACE_IDX[piece-1, cell] = action.
PLACE_IDX = (np.arange(1, NUM_PIECES + 1)[:, None] * CELLS
             + np.arange(CELLS)[None, :])
_place_idx_j = jnp.asarray(PLACE_IDX.reshape(-1))

# Mirror (fliplr) permutations per phase: PERM[new_action] = old_action.
def _build_mirror_perms():
    move_perm = np.arange(ACTION_SIZE, dtype=np.int64)
    for r in range(H):
        for c in range(W):
            for mt in range(MT):
                r2, c2 = int(DEST_R[r, c, mt]), int(DEST_C[r, c, mt])
                nc, nc2 = W - 1 - c, W - 1 - c2
                if nc == nc2:
                    nmt = r2 if r2 < r else r2 - 1
                else:
                    nmt = (H - 1) + (nc2 if nc2 < nc else nc2 - 1)
                new_a = (nc + r * W) * MT + nmt
                old_a = (c + r * W) * MT + mt
                move_perm[new_a] = old_a
    place_perm = np.arange(ACTION_SIZE, dtype=np.int64)
    for p in range(1, NUM_PIECES + 1):
        for r in range(H):
            for c in range(W):
                old_a = p * CELLS + r * W + c
                new_a = p * CELLS + r * W + (W - 1 - c)
                place_perm[new_a] = old_a
    return np.stack([place_perm, move_perm])


MIRROR_PERMS = jnp.asarray(_build_mirror_perms())


@struct.dataclass
class StrategoState:
    board: jnp.ndarray  # uint8[H, W] incl. visibility
    red_to_place: jnp.ndarray  # int8[NUM_PIECES + 1] remaining counts
    blue_to_place: jnp.ndarray
    red_bombs: jnp.ndarray  # bool[H, W] exploded red bombs
    blue_bombs: jnp.ndarray
    red_flag_captured: jnp.ndarray  # bool
    blue_flag_captured: jnp.ndarray
    player: jnp.ndarray  # int32: 0 = red, 1 = blue
    turns: jnp.ndarray
    last_action: jnp.ndarray


def _base(v):
    return v % VISIBLE_OFFSET


def _is_red(v):
    b = _base(v)
    return (b >= 1) & (b <= NUM_PIECES)


def _is_blue(v):
    b = _base(v)
    return (b >= TEAM_OFFSET + 1) & (b <= TEAM_OFFSET + NUM_PIECES)


def _rank(v):
    return _base(v) % TEAM_OFFSET


class Stratego(Env):
    NAME = "stratego"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = ACTION_SIZE
    OBS_SHAPE = (NUM_CHANNELS, H, W)
    MAX_TURNS = DRAW_MOVE_COUNT
    HAS_DRAW = True
    NUM_SYMMETRIES = 2
    BOARD_SHAPE = (H, W)

    State = StrategoState

    @staticmethod
    def init() -> StrategoState:
        return StrategoState(
            board=jnp.asarray(_START),
            red_to_place=jnp.asarray(PIECE_COUNTS),
            blue_to_place=jnp.asarray(PIECE_COUNTS),
            red_bombs=jnp.zeros((H, W), jnp.bool_),
            blue_bombs=jnp.zeros((H, W), jnp.bool_),
            red_flag_captured=jnp.bool_(False),
            blue_flag_captured=jnp.bool_(False),
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def _play_phase(state: StrategoState):
        return (jnp.sum(state.red_to_place) + jnp.sum(state.blue_to_place)) == 0

    # ------------------------------------------------------------------ step
    @staticmethod
    def step(state: StrategoState, action) -> StrategoState:
        action = jnp.asarray(action, jnp.int32)

        def placement(state):
            piece = action // CELLS  # 1..12
            cell = action % CELLS
            r, c = cell // W, cell % W
            is_red = state.player == 0
            value = jnp.where(is_red, piece, piece + TEAM_OFFSET).astype(
                jnp.uint8
            )
            board = state.board.at[r, c].set(value)
            red_tp = jnp.where(
                is_red, state.red_to_place.at[piece].add(-1),
                state.red_to_place,
            )
            blue_tp = jnp.where(
                ~is_red, state.blue_to_place.at[piece].add(-1),
                state.blue_to_place,
            )
            return state.replace(
                board=board, red_to_place=red_tp, blue_to_place=blue_tp,
            )

        def movement(state):
            board = state.board
            cell = action // MT
            r, c = cell // W, cell % W
            r2 = _dest_r_j[action]
            c2 = _dest_c_j[action]

            src = _base(board[r, c])  # visibility stripped on move
            dst = _base(board[r2, c2])
            board = board.at[r, c].set(jnp.uint8(0))

            src_rank = src % TEAM_OFFSET
            dst_rank = dst % TEAM_OFFSET
            dst_is_red = _is_red(dst)
            empty_dest = dst == 0

            flag_hit = (~empty_dest) & (dst_rank == FLAG)
            both_die = (~empty_dest) & (
                ((dst_rank == BOMB) & (src_rank != MINER))
                | (src_rank == dst_rank)
            )
            spy_kill = (src_rank == SPY) & (dst_rank == MARSHAL)
            defender_wins = (~empty_dest) & ~flag_hit & ~both_die & (
                (src_rank < dst_rank) & ~spy_kill
            )
            attacker_wins = (~empty_dest) & ~flag_hit & ~both_die & \
                ~defender_wins

            new_dest = jnp.where(
                empty_dest, src,
                jnp.where(
                    both_die, jnp.uint8(0),
                    jnp.where(
                        defender_wins, (dst + VISIBLE_OFFSET).astype(jnp.uint8),
                        (src + VISIBLE_OFFSET).astype(jnp.uint8),
                    ),
                ),
            ).astype(jnp.uint8)
            # flag capture: attacker lands and becomes visible
            # (engine.pyx:232-250, final visibility line applies).
            new_dest = jnp.where(
                flag_hit, (src + VISIBLE_OFFSET).astype(jnp.uint8), new_dest
            )
            board = board.at[r2, c2].set(new_dest)

            bomb_exploded = both_die & (dst_rank == BOMB)
            red_bombs = jnp.where(
                bomb_exploded & dst_is_red,
                state.red_bombs.at[r2, c2].set(True), state.red_bombs,
            )
            blue_bombs = jnp.where(
                bomb_exploded & ~dst_is_red,
                state.blue_bombs.at[r2, c2].set(True), state.blue_bombs,
            )
            return state.replace(
                board=board,
                red_bombs=red_bombs,
                blue_bombs=blue_bombs,
                red_flag_captured=state.red_flag_captured
                | (flag_hit & dst_is_red),
                blue_flag_captured=state.blue_flag_captured
                | (flag_hit & ~dst_is_red),
            )

        state = jax.lax.cond(
            Stratego._play_phase(state), movement, placement, state
        )
        return state.replace(
            player=(state.player + 1) % NUM_PLAYERS,
            turns=state.turns + 1,
            last_action=action,
        )

    # ----------------------------------------------------------- valid moves
    @staticmethod
    def valid_moves(state: StrategoState) -> jnp.ndarray:
        board = state.board

        def placement(state):
            is_red = state.player == 0
            rows = jnp.arange(H)
            zone = jnp.where(is_red, rows < 3, rows > 4)[:, None]
            empty = (board == 0) & zone
            counts = jnp.where(is_red, state.red_to_place,
                               state.blue_to_place)
            have = counts[1:] > 0  # [12]
            grid = have[:, None] & empty.reshape(-1)[None, :]  # [12, 80]
            valids = jnp.zeros((ACTION_SIZE,), jnp.bool_)
            return valids.at[_place_idx_j].set(grid.reshape(-1))

        def movement(state):
            is_red = state.player == 0
            mine = jnp.where(is_red, _is_red(board), _is_blue(board))
            enemy = jnp.where(is_red, _is_blue(board), _is_red(board))
            rank = _rank(board)
            movable = mine & (rank != BOMB) & (rank != FLAG)
            scout = mine & (rank == SCOUT)

            occupied = (board != 0).astype(jnp.float32).reshape(-1)
            blocked = _between_j @ occupied > 0.5  # any piece/lake between
            dest_open = _dest_oh_j @ (
                (board == 0) | enemy
            ).astype(jnp.float32).reshape(-1) > 0.5

            src_movable = jnp.repeat(movable.reshape(-1), MT)
            src_scout = jnp.repeat(scout.reshape(-1), MT)
            one_step = src_movable & _dist1_j & dest_open
            rides = src_scout & ~blocked & dest_open
            return one_step | rides

        return jax.lax.cond(
            Stratego._play_phase(state), movement, placement, state
        )

    @staticmethod
    def _team_stuck(board, red: bool):
        mine = _is_red(board) if red else _is_blue(board)
        enemy = _is_blue(board) if red else _is_red(board)
        rank = _rank(board)
        movable = mine & (rank != BOMB) & (rank != FLAG)
        dest_open = _dest_oh_j @ (
            (board == 0) | enemy
        ).astype(jnp.float32).reshape(-1) > 0.5
        src_movable = jnp.repeat(movable.reshape(-1), MT)
        return ~jnp.any(src_movable & _dist1_j & dest_open)

    @staticmethod
    def win_state(state: StrategoState) -> jnp.ndarray:
        draw = state.turns >= DRAW_MOVE_COUNT
        play = Stratego._play_phase(state)
        # has_legal_moves is vacuously true in the placement phase
        # (engine.pyx:200-201).
        red_stuck = play & Stratego._team_stuck(state.board, red=True)
        blue_stuck = play & Stratego._team_stuck(state.board, red=False)
        blue_wins = state.red_flag_captured | red_stuck
        red_wins = (state.blue_flag_captured | blue_stuck) & ~blue_wins
        return jnp.stack([
            red_wins & ~draw,
            blue_wins & ~draw,
            draw,
        ]).astype(jnp.float32)

    @staticmethod
    def crude_value(state: StrategoState) -> jnp.ndarray:
        """Mover-perspective heuristic for greedy baselines: decided games
        1/0, else 0.5 + a rank-weighted material balance (reference pattern:
        envs/brandubh/fastafl.pyx:258-268; the reference ships no stratego
        heuristic player)."""
        w = Stratego.win_state(state)
        me = w[state.player]
        opp = w[(state.player + 1) % NUM_PLAYERS]
        board = state.board
        ranks = _rank(board).astype(jnp.float32)
        red_mat = jnp.sum(jnp.where(_is_red(board), ranks, 0.0))
        blue_mat = jnp.sum(jnp.where(_is_blue(board), ranks, 0.0))
        total = red_mat + blue_mat + 1e-6
        diff = (red_mat - blue_mat) / total  # in [-1, 1]
        mine = jnp.where(state.player == 0, diff, -diff)
        running = 0.5 + 0.45 * mine
        return jnp.where(me > 0, 1.0, jnp.where(opp > 0, 0.0, running))

    # ----------------------------------------------------------- observation
    @staticmethod
    def observation(state: StrategoState) -> jnp.ndarray:
        board = state.board
        planes = [
            _is_red(board).astype(jnp.float32),
            _is_blue(board).astype(jnp.float32),
        ]
        for i in range(1, NUM_PIECES + 1):
            planes.append((board == i + VISIBLE_OFFSET).astype(jnp.float32))
            planes.append(
                (board == i + VISIBLE_OFFSET + TEAM_OFFSET).astype(jnp.float32)
            )
        planes.append(state.red_bombs.astype(jnp.float32))
        planes.append(state.blue_bombs.astype(jnp.float32))
        planes.append(jnp.full((H, W), state.player, jnp.float32))
        planes.append(
            jnp.full((H, W), state.turns / DRAW_MOVE_COUNT, jnp.float32)
        )
        return jnp.stack(planes)

    @classmethod
    def symmetries(cls, obs: jnp.ndarray, pi: jnp.ndarray):
        """Identity + left/right mirror (stratego.pyx:238-257). The mirror's
        policy permutation depends on the phase, inferred from the turn plane
        (placement is exactly the first PLACEMENT_TURNS turns)."""
        turns = obs[NUM_CHANNELS - 1, 0, 0] * DRAW_MOVE_COUNT
        is_move_phase = (turns + 0.5) >= PLACEMENT_TURNS
        perm = jnp.where(is_move_phase, MIRROR_PERMS[1], MIRROR_PERMS[0])
        return (
            jnp.stack([obs, obs[:, :, ::-1]]),
            jnp.stack([pi, pi[perm]]),
        )

    @staticmethod
    def in_placement(state: StrategoState) -> bool:
        """Host-side phase check (for UIs/tests)."""
        return not bool(Stratego._play_phase(state))

    @staticmethod
    def encode_place(piece: int, r: int, c: int) -> int:
        """Placement action for piece type 1..12 at (r, c)."""
        return piece * CELLS + r * W + c

    @staticmethod
    def encode_action(r: int, c: int, r2: int, c2: int) -> int:
        """Movement action (rook encoding, same scheme as the tafl envs)."""
        if c == c2:
            mt = r2 if r2 < r else r2 - 1
        else:
            mt = (H - 1) + (c2 if c2 < c else c2 - 1)
        return (r * W + c) * MT + mt

    @staticmethod
    def decode_action(action: int):
        """Movement action → ((r, c), (r2, c2)) for display/UIs."""
        cell, _ = divmod(int(action), MT)
        r, c = divmod(cell, W)
        return (r, c), (int(DEST_R[r, c, int(action) % MT]),
                        int(DEST_C[r, c, int(action) % MT]))

    @classmethod
    def display(cls, state: StrategoState) -> str:
        board = np.asarray(state.board)
        out = []
        for r in range(H):
            row = []
            for c in range(W):
                v = int(board[r, c])
                b = v % VISIBLE_OFFSET
                if v == 0:
                    row.append(" . ")
                elif b == LAKE:
                    row.append(" ~ ")
                else:
                    rank = b % TEAM_OFFSET
                    team = "r" if b <= NUM_PIECES else "b"
                    vis = "!" if v >= VISIBLE_OFFSET else " "
                    row.append(f"{team}{rank:x}{vis}")
            out.append("".join(row))
        return "\n".join(out)


Game = Stratego
