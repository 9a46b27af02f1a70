"""Chess — full rules as a vectorized JAX kernel.

The reference ships only a non-functional stub (reference:
alphazero/envs/chess/chess.py:82-92 — ``play_action``/``win_state``/
``observation`` are literally ``pass``, and ``action_size`` is computed with
``^`` instead of ``**``, chess.py:11). This module exceeds it with a complete,
jittable implementation: legal move generation (pins, checks, castling,
en passant incl. the discovered-check case, promotions and underpromotions),
termination (checkmate, stalemate, 50-move rule, insufficient material,
turn cap) and an AlphaZero-style 8x8x73 action encoding.

TPU-first design: the board is an int8[8,8] tensor and every rule is a
branch-free mask computation. Sliding-piece attacks use direction-shift
occluded fills (the classic "dumb7fill", 7 shift+mask steps per direction —
the same pattern as the othello flip scan in envs/othello.py); pins and check
evasions come from king-ray analysis, so legality never needs per-move
simulation except for the <=2 possible en-passant captures, which are
validated by masked occupancy simulation. Everything vmaps: thousands of
boards step in lockstep.

Coordinates are absolute (no board flipping): board[rank, file] with rank 0 =
rank 1 (White's back rank); White pieces positive, Black negative.

Action encoding (from-square major): ``action = (rank*8 + file) * 73 + plane``
  planes 0..55   queen-like moves: dir*7 + (distance-1), dirs ordered
                 N, NE, E, SE, S, SW, W, NW (N = +rank). A pawn reaching the
                 last rank through these planes auto-promotes to a queen.
  planes 56..63  knight moves.
  planes 64..72  underpromotions: 3 directions (push, capture toward file-1,
                 capture toward file+1, relative to the mover) x {N, B, R}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_general_tpu.envs.core import Env

# Piece codes (White positive, Black negative).
PAWN, KNIGHT, BISHOP, ROOK, QUEEN, KING = 1, 2, 3, 4, 5, 6

NUM_PLAYERS = 2
BOARD = 8
NUM_PLANES = 73
ACTION_SIZE = BOARD * BOARD * NUM_PLANES  # 4672
MAX_TURNS = 512  # ply cap (AlphaZero-style forced draw)
NUM_CHANNELS = 20

# Queen-move directions, N = +rank.
DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
ORTHO = {(1, 0), (-1, 0), (0, 1), (0, -1)}
# Line type for pin matching: N-S=0, E-W=1, NE-SW=2, NW-SE=3.
LINE_TYPE = {(1, 0): 0, (-1, 0): 0, (0, 1): 1, (0, -1): 1,
             (1, 1): 2, (-1, -1): 2, (-1, 1): 3, (1, -1): 3}
KNIGHT_DELTAS = ((2, 1), (1, 2), (-1, 2), (-2, 1),
                 (-2, -1), (-1, -2), (1, -2), (2, -1))
UNDER_DF = (0, -1, 1)  # push, capture toward file-1, capture toward file+1
UNDER_PROMO = (KNIGHT, BISHOP, ROOK)

# --- plane decode tables (used by step) --------------------------------------
_tdr = np.zeros(NUM_PLANES, np.int32)
_tdf = np.zeros(NUM_PLANES, np.int32)
_tpromo = np.zeros(NUM_PLANES, np.int32)  # piece code on promotion
_tunder = np.zeros(NUM_PLANES, np.int32)  # 1 = dr is relative to mover
for _di, (_dr, _df) in enumerate(DIRS):
    for _k in range(1, 8):
        _p = _di * 7 + _k - 1
        _tdr[_p], _tdf[_p], _tpromo[_p] = _dr * _k, _df * _k, QUEEN
for _i, (_dr, _df) in enumerate(KNIGHT_DELTAS):
    _tdr[56 + _i], _tdf[56 + _i] = _dr, _df
for _u, _dfu in enumerate(UNDER_DF):
    for _pi, _pc in enumerate(UNDER_PROMO):
        _p = 64 + _u * 3 + _pi
        _tdr[_p], _tdf[_p], _tpromo[_p], _tunder[_p] = 1, _dfu, _pc, 1
TDR, TDF = jnp.asarray(_tdr), jnp.asarray(_tdf)
TPROMO, TUNDER = jnp.asarray(_tpromo), jnp.asarray(_tunder)

# Castling-rights mask per square touched: moving from/to these squares
# clears rights [WK, WQ, BK, BQ].
_rmask = np.ones((64, 4), bool)
_rmask[0 * 8 + 4, 0:2] = False  # e1
_rmask[0 * 8 + 7, 0] = False    # h1
_rmask[0 * 8 + 0, 1] = False    # a1
_rmask[7 * 8 + 4, 2:4] = False  # e8
_rmask[7 * 8 + 7, 2] = False    # h8
_rmask[7 * 8 + 0, 3] = False    # a8
RIGHTS_MASK = jnp.asarray(_rmask)

_START = np.zeros((8, 8), np.int8)
_START[0] = [ROOK, KNIGHT, BISHOP, QUEEN, KING, BISHOP, KNIGHT, ROOK]
_START[1] = PAWN
_START[6] = -PAWN
_START[7] = -np.asarray(_START[0])
START_BOARD = jnp.asarray(_START)

_ROW = jax.lax.broadcasted_iota(jnp.int32, (BOARD, BOARD), 0)
_COL = jax.lax.broadcasted_iota(jnp.int32, (BOARD, BOARD), 1)

# Zobrist hashing for threefold-repetition detection. Piece codes -6..6 map
# to rows 0..12 of the table; empty (row 6) hashes to 0 so vacant squares
# do not contribute.
_zrng = np.random.default_rng(0xC4E55)
_ztab = _zrng.integers(0, 2**32, size=(13, 64), dtype=np.uint32)
_ztab[6] = 0
ZOBRIST_PIECE = jnp.asarray(_ztab)
ZOBRIST_CASTLE = jnp.asarray(
    _zrng.integers(0, 2**32, size=(4,), dtype=np.uint32))
ZOBRIST_EP_FILE = jnp.asarray(
    _zrng.integers(0, 2**32, size=(8,), dtype=np.uint32))
ZOBRIST_SIDE = jnp.uint32(int(_zrng.integers(0, 2**32, dtype=np.uint32)))
#: repetition ring length — bounded by the 50-move rule (100 plies) plus the
#: current position.
HIST_LEN = 101


def _position_hash(board, castling, ep, player) -> jnp.ndarray:
    """uint32 Zobrist hash of the full repetition-relevant position (board,
    side to move, castling rights, ep file)."""
    rows = jnp.clip(board.astype(jnp.int32) + 6, 0, 12).reshape(64)
    h = jax.lax.reduce(
        ZOBRIST_PIECE[rows, jnp.arange(64)], jnp.uint32(0),
        jax.lax.bitwise_xor, (0,),
    )
    cast = jnp.where(castling, ZOBRIST_CASTLE, jnp.uint32(0))
    h = h ^ cast[0] ^ cast[1] ^ cast[2] ^ cast[3]
    h = h ^ jnp.where(ep >= 0, ZOBRIST_EP_FILE[jnp.maximum(ep, 0) % 8],
                      jnp.uint32(0))
    return h ^ jnp.where(player == 1, ZOBRIST_SIDE, jnp.uint32(0))


@struct.dataclass
class ChessState:
    board: jnp.ndarray  # int8[8, 8]
    castling: jnp.ndarray  # bool[4] = [WK, WQ, BK, BQ]
    ep: jnp.ndarray  # int32 en-passant target square (rank*8+file), -1 = none
    halfmove: jnp.ndarray  # int32, 50-move-rule clock (plies)
    hist: jnp.ndarray  # uint32[HIST_LEN] Zobrist ring since last zeroing move
    player: jnp.ndarray  # int32 scalar, 0 = White
    turns: jnp.ndarray  # int32 scalar (plies played)
    last_action: jnp.ndarray  # int32 scalar


def _shift(x: jnp.ndarray, dr: int, df: int) -> jnp.ndarray:
    """Zero-filled shift: out[r, f] = x[r-dr, f-df] (content moves by +d)."""
    out = jnp.zeros_like(x)
    return out.at[max(dr, 0):BOARD + min(dr, 0),
                  max(df, 0):BOARD + min(df, 0)].set(
        x[max(-dr, 0):BOARD - max(dr, 0), max(-df, 0):BOARD - max(df, 0)])


def _fill(seed: jnp.ndarray, occ: jnp.ndarray, dr: int, df: int) -> jnp.ndarray:
    """Squares reachable from ``seed`` sliding in (dr, df): every empty square
    along the ray plus the first occupied one (occluded dumb7fill)."""
    att = _shift(seed, dr, df)
    res = att
    for _ in range(6):
        att = _shift(att & ~occ, dr, df)
        res = res | att
    return res


def _steps(seed: jnp.ndarray, deltas) -> jnp.ndarray:
    res = jnp.zeros_like(seed)
    for dr, df in deltas:
        res = res | _shift(seed, dr, df)
    return res


def _pawn_attacks(pawns: jnp.ndarray, white: jnp.ndarray) -> jnp.ndarray:
    """Squares attacked by ``pawns``; ``white`` selects attack direction."""
    up = _shift(pawns, 1, 1) | _shift(pawns, 1, -1)
    down = _shift(pawns, -1, 1) | _shift(pawns, -1, -1)
    return jnp.where(white, up, down)


def _one_hot(r, f):
    return (_ROW == r) & (_COL == f)


def _attacked(king: jnp.ndarray, occ: jnp.ndarray, op_p, op_n, op_k,
              op_rq, op_bq, white_to_move) -> jnp.ndarray:
    """Scalar bool: is the (single) square in ``king`` attacked?"""
    hit = jnp.any(_steps(king, KNIGHT_DELTAS) & op_n)
    hit |= jnp.any(_steps(king, DIRS) & op_k)
    # Enemy pawn giving check sits at king+(fwd, +-1) where fwd is the
    # mover's forward direction.
    pawn_sq = jnp.where(
        white_to_move,
        _shift(king, 1, 1) | _shift(king, 1, -1),
        _shift(king, -1, 1) | _shift(king, -1, -1),
    )
    hit |= jnp.any(pawn_sq & op_p)
    for dr, df in DIRS:
        ray = _fill(king, occ, dr, df)
        sliders = op_rq if (dr, df) in ORTHO else op_bq
        hit |= jnp.any(ray & sliders)
    return hit


def _movegen(state: ChessState):
    """Full legal move generation.

    Returns (planes, in_check) where ``planes`` is bool[73, 8, 8] indexed by
    [plane, from_rank, from_file].
    """
    board = state.board
    white = state.player == 0
    sign = jnp.where(white, 1, -1).astype(jnp.int8)
    rel = board * sign  # positive = mover's pieces
    own = rel > 0
    enemy = rel < 0
    occ = board != 0
    empty = ~occ

    my_p, my_n, my_b = rel == PAWN, rel == KNIGHT, rel == BISHOP
    my_r, my_q, my_k = rel == ROOK, rel == QUEEN, rel == KING
    op_p, op_n, op_b = rel == -PAWN, rel == -KNIGHT, rel == -BISHOP
    op_r, op_q, op_k = rel == -ROOK, rel == -QUEEN, rel == -KING
    op_rq, op_bq = op_r | op_q, op_b | op_q

    # ---- enemy attack map, x-raying through our king (for king moves) ------
    occ_x = occ & ~my_k
    enemy_att = _steps(op_n, KNIGHT_DELTAS) | _steps(op_k, DIRS)
    enemy_att |= _pawn_attacks(op_p, ~white)  # enemy moves the other way
    for dr, df in DIRS:
        sliders = op_rq if (dr, df) in ORTHO else op_bq
        enemy_att = enemy_att | _fill(sliders, occ_x, dr, df)

    # ---- checkers, check-evasion mask, pins (king-ray analysis) ------------
    checkers = _steps(my_k, KNIGHT_DELTAS) & op_n
    pawn_chk = jnp.where(
        white,
        _shift(my_k, 1, 1) | _shift(my_k, 1, -1),
        _shift(my_k, -1, 1) | _shift(my_k, -1, -1),
    ) & op_p
    checkers = checkers | pawn_chk
    checkmask = checkers  # capture-the-checker squares; rays added below
    pin_line = jnp.full((BOARD, BOARD), -1, jnp.int32)
    check_count = jnp.sum(checkers).astype(jnp.int32)
    for dr, df in DIRS:
        sliders = op_rq if (dr, df) in ORTHO else op_bq
        ray = _fill(my_k, occ, dr, df)  # empties + first blocker
        blocker = ray & occ
        gives_check = jnp.any(blocker & sliders)
        checkmask = checkmask | (ray & jnp.where(gives_check, True, False))
        check_count = check_count + gives_check.astype(jnp.int32)
        # pin: first blocker is ours, next piece beyond is a matching slider
        cand = blocker & own
        beyond = _fill(cand, occ, dr, df)
        pinner = beyond & occ & sliders
        is_pin = jnp.any(cand) & jnp.any(pinner)
        pin_line = jnp.where(cand & is_pin, LINE_TYPE[(dr, df)], pin_line)
    in_check = check_count > 0
    # no check: all targets allowed; double check: none (king moves only)
    checkmask = jnp.where(in_check, checkmask, True)
    checkmask = checkmask & (check_count < 2)
    unpinned = pin_line < 0

    planes = {}

    # ---- queen-like planes (sliders, king, pawns, castling) ----------------
    for dr, df in DIRS:
        ortho = (dr, df) in ORTHO
        ltype = LINE_TYPE[(dr, df)]
        pin_ok = unpinned | (pin_line == ltype)
        slider = (my_q | (my_r if ortho else my_b)) & pin_ok
        open_k = jnp.ones((BOARD, BOARD), bool)  # path strictly-between empty
        for k in range(1, 8):
            inv = lambda x: _shift(x, -k * dr, -k * df)  # noqa: E731
            onb = inv(jnp.ones((BOARD, BOARD), bool))
            tgt_ok = onb & ~inv(own)
            v = slider & open_k & tgt_ok & inv(checkmask)
            if k == 1:
                # king: attack map instead of checkmask, pins don't apply
                v = v | (my_k & tgt_ok & ~inv(enemy_att))
                # pawns: push on the two vertical dirs, captures on diagonals
                if df == 0 and dr in (1, -1):
                    gate = white if dr == 1 else ~white
                    pv = my_p & gate & pin_ok & inv(empty) & inv(checkmask)
                    planes[("pawn", dr, df)] = pv
                    v = v | pv
                elif dr in (1, -1):
                    gate = white if dr == 1 else ~white
                    pv = my_p & gate & pin_ok & inv(enemy) & inv(checkmask)
                    planes[("pawn", dr, df)] = pv
                    v = v | pv
            if k == 2 and df == 0 and dr in (1, -1):
                gate = white if dr == 1 else ~white
                start = _ROW == (1 if dr == 1 else 6)
                v = v | (my_p & gate & start & pin_ok & open_k
                         & inv(empty) & inv(checkmask))
            if k == 2 and dr == 0:  # castling: king slides two files
                east = df == 1
                for p0, rights_i, rank in ((True, 0 if east else 1, 0),
                                           (False, 2 if east else 3, 7)):
                    gate = white if p0 else ~white
                    if east:  # kingside: f,g empty; e,f,g safe
                        clear = empty[rank, 5] & empty[rank, 6]
                        safe = ~(enemy_att[rank, 4] | enemy_att[rank, 5]
                                 | enemy_att[rank, 6])
                    else:  # queenside: b,c,d empty; c,d,e safe
                        clear = empty[rank, 1] & empty[rank, 2] & empty[rank, 3]
                        safe = ~(enemy_att[rank, 2] | enemy_att[rank, 3]
                                 | enemy_att[rank, 4])
                    ok = (gate & state.castling[rights_i] & clear & safe
                          & my_k[rank, 4])
                    v = v | (_one_hot(rank, 4) & ok)
            planes[(dr, df, k)] = v
            open_k = open_k & inv(empty)

    # ---- en passant (validated by occupancy simulation: covers pins and the
    # discovered-check along the cleared rank, cengine-style rules don't
    # apply here — this is the one case where ray analysis is insufficient) --
    has_ep = state.ep >= 0
    ep_r = jnp.maximum(state.ep, 0) // 8
    ep_f = jnp.maximum(state.ep, 0) % 8
    fwd = jnp.where(white, 1, -1)
    cap_r = ep_r - fwd  # capturing pawn's rank == captured pawn's rank
    for side in (-1, 1):
        cap_f = ep_f + side
        inb = (cap_f >= 0) & (cap_f < BOARD)
        cf = jnp.clip(cap_f, 0, BOARD - 1)
        from_sq = _one_hot(cap_r, cf)
        exists = has_ep & inb & jnp.any(from_sq & my_p)
        captured = _one_hot(cap_r, ep_f)
        target = _one_hot(ep_r, ep_f)
        occ2 = (occ & ~from_sq & ~captured) | target
        legal = exists & ~_attacked(my_k, occ2, op_p & ~captured, op_n, op_k,
                                    op_rq, op_bq, white)
        # the move's direction is (fwd, -side); fwd is dynamic, so route the
        # bit into both vertical variants gated by side-to-move
        for dr, gate in ((1, white), (-1, ~white)):
            key = (dr, -side, 1)
            planes[key] = planes[key] | (from_sq & legal & gate)
            pkey = ("pawn", dr, -side)
            planes[pkey] = planes[pkey] | (from_sq & legal & gate)

    # ---- knight planes ------------------------------------------------------
    for dr, df in KNIGHT_DELTAS:
        inv = lambda x: _shift(x, -dr, -df)  # noqa: E731
        onb = inv(jnp.ones((BOARD, BOARD), bool))
        planes[("n", dr, df)] = (my_n & unpinned & onb & ~inv(own)
                                 & inv(checkmask))

    # ---- underpromotion planes ----------------------------------------------
    for u, dfu in enumerate(UNDER_DF):
        pv = jnp.where(white,
                       planes[("pawn", 1, dfu)] & (_ROW == 6),
                       planes[("pawn", -1, dfu)] & (_ROW == 1))
        planes[("u", u)] = pv

    ordered = [planes[(dr, df, k)] for dr, df in DIRS for k in range(1, 8)]
    ordered += [planes[("n", dr, df)] for dr, df in KNIGHT_DELTAS]
    ordered += [planes[("u", u)] for u in range(3) for _ in range(3)]
    return jnp.stack(ordered), in_check


def _insufficient_material(board: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(board)
    heavy = jnp.any((a == PAWN) | (a == ROOK) | (a == QUEEN))
    minors = jnp.sum(((a == KNIGHT) | (a == BISHOP)).astype(jnp.int32))
    return ~heavy & (minors <= 1)


class Chess(Env):
    NAME = "chess"
    NUM_PLAYERS = NUM_PLAYERS
    ACTION_SIZE = ACTION_SIZE
    OBS_SHAPE = (NUM_CHANNELS, BOARD, BOARD)
    MAX_TURNS = MAX_TURNS
    HAS_DRAW = True
    NUM_SYMMETRIES = 1  # castling/pawn structure break the dihedral group

    State = ChessState

    @staticmethod
    def init() -> ChessState:
        hist = jnp.zeros(HIST_LEN, jnp.uint32).at[0].set(
            _position_hash(START_BOARD, jnp.ones(4, bool), jnp.int32(-1),
                           jnp.int32(0)))
        return ChessState(
            board=START_BOARD,
            castling=jnp.ones(4, bool),
            ep=jnp.int32(-1),
            halfmove=jnp.int32(0),
            hist=hist,
            player=jnp.int32(0),
            turns=jnp.int32(0),
            last_action=jnp.int32(-1),
        )

    @staticmethod
    def step(state: ChessState, action) -> ChessState:
        action = jnp.asarray(action, jnp.int32)
        board = state.board
        from_sq, plane = action // NUM_PLANES, action % NUM_PLANES
        fr, ff = from_sq // 8, from_sq % 8
        white = state.player == 0
        sign = jnp.where(white, 1, -1).astype(jnp.int8)
        dr = jnp.where(TUNDER[plane] == 1,
                       TDR[plane] * jnp.where(white, 1, -1), TDR[plane])
        tr, tf = fr + dr, ff + TDF[plane]
        to_sq = tr * 8 + tf

        piece = board[fr, ff]
        is_pawn = jnp.abs(piece) == PAWN
        # en passant: diagonal pawn move onto an empty square
        is_ep = is_pawn & (tf != ff) & (board[tr, tf] == 0)
        cap_r = jnp.where(is_ep, fr, tr)  # captured pawn sits on from-rank
        is_capture = (board[tr, tf] != 0) | is_ep

        promo_rank = jnp.where(white, 7, 0)
        is_promo = is_pawn & (tr == promo_rank)
        new_piece = jnp.where(is_promo,
                              (TPROMO[plane] * jnp.where(white, 1, -1)
                               ).astype(jnp.int8),
                              piece)

        board = board.at[fr, ff].set(0)
        board = board.at[cap_r, tf].set(0)
        board = board.at[tr, tf].set(new_piece)

        # castling: move the rook too
        is_castle = (jnp.abs(piece) == KING) & (jnp.abs(tf - ff) == 2)
        east = tf > ff
        rf_from = jnp.where(east, 7, 0)
        rf_to = jnp.where(east, 5, 3)
        rook = board[fr, rf_from]
        castled = board.at[fr, rf_from].set(0).at[fr, rf_to].set(rook)
        board = jnp.where(is_castle, castled, board)

        castling = state.castling & RIGHTS_MASK[from_sq] & RIGHTS_MASK[to_sq]
        is_double = is_pawn & (jnp.abs(tr - fr) == 2)
        ep = jnp.asarray(
            jnp.where(is_double, ((fr + tr) // 2) * 8 + ff, -1), jnp.int32)
        halfmove = jnp.asarray(
            jnp.where(is_pawn | is_capture, 0, state.halfmove + 1), jnp.int32)
        player = (state.player + 1) % NUM_PLAYERS

        # Repetition ring: pawn moves and captures are irreversible, so the
        # ring restarts whenever the 50-move clock resets; the write index is
        # the clock itself (bounded by HIST_LEN - 1; at 100 the game is a
        # draw regardless).
        h = _position_hash(board, castling, ep, player)
        idx = jnp.minimum(halfmove, HIST_LEN - 1)
        hist = jnp.where(halfmove == 0, jnp.zeros_like(state.hist), state.hist)
        hist = hist.at[idx].set(h)

        return ChessState(
            board=board,
            castling=castling,
            ep=ep,
            halfmove=halfmove,
            hist=hist,
            player=player,
            turns=state.turns + 1,
            last_action=action,
        )

    @staticmethod
    def valid_moves(state: ChessState) -> jnp.ndarray:
        planes, _ = _movegen(state)
        return jnp.transpose(planes, (1, 2, 0)).reshape(ACTION_SIZE)

    @staticmethod
    def win_state(state: ChessState) -> jnp.ndarray:
        planes, in_check = _movegen(state)
        no_moves = ~jnp.any(planes)
        mate = no_moves & in_check
        p0 = mate & (state.player == 1)
        p1 = mate & (state.player == 0)
        cur = _position_hash(state.board, state.castling, state.ep,
                             state.player)
        in_ring = jnp.arange(HIST_LEN) <= jnp.minimum(state.halfmove,
                                                      HIST_LEN - 1)
        repetitions = jnp.sum((state.hist == cur) & in_ring)
        draw = ((no_moves & ~in_check)
                | (state.halfmove >= 100)
                | (repetitions >= 3)
                | (state.turns >= MAX_TURNS)
                | _insufficient_material(state.board)) & ~mate
        return jnp.stack([p0, p1, draw]).astype(jnp.float32)

    @staticmethod
    def observation(state: ChessState) -> jnp.ndarray:
        b = state.board
        pieces = [(b == c).astype(jnp.float32)
                  for c in (PAWN, KNIGHT, BISHOP, ROOK, QUEEN, KING)]
        pieces += [(b == -c).astype(jnp.float32)
                   for c in (PAWN, KNIGHT, BISHOP, ROOK, QUEEN, KING)]
        full = lambda v: jnp.full((BOARD, BOARD), v, jnp.float32)  # noqa: E731
        colour = full(state.player)
        turn = full(state.turns / MAX_TURNS)
        rights = [full(state.castling[i]) for i in range(4)]
        ep_plane = ((_ROW * 8 + _COL) == state.ep).astype(jnp.float32)
        clock = full(jnp.minimum(state.halfmove, 100) / 100.0)
        return jnp.stack(pieces + [colour, turn] + rights + [ep_plane, clock])

    @staticmethod
    def crude_value(state: ChessState) -> jnp.ndarray:
        """Material balance mapped to [0, 1] from the mover's perspective."""
        vals = jnp.asarray([0, 1, 3, 3, 5, 9, 0], jnp.float32)
        a = jnp.clip(jnp.abs(state.board), 0, 6)
        mat = jnp.sum(jnp.sign(state.board) * vals[a])
        mine = jnp.where(state.player == 0, mat, -mat)
        return jnp.clip(0.5 + mine / 40.0, 0.0, 1.0)

    @classmethod
    def display(cls, state: ChessState) -> str:
        sym = {0: ".", PAWN: "P", KNIGHT: "N", BISHOP: "B", ROOK: "R",
               QUEEN: "Q", KING: "K", -PAWN: "p", -KNIGHT: "n", -BISHOP: "b",
               -ROOK: "r", -QUEEN: "q", -KING: "k"}
        b = np.asarray(state.board)
        rows = []
        for r in range(7, -1, -1):
            rows.append(f"{r + 1} " + " ".join(sym[int(v)] for v in b[r]))
        rows.append("  a b c d e f g h")
        rows.append(f"{'White' if int(state.player) == 0 else 'Black'} to move")
        return "\n".join(rows)


Game = Chess  # reference-style module-level alias


# --- host-side helpers (numpy; not jitted) -----------------------------------

_FEN_PIECES = {"P": PAWN, "N": KNIGHT, "B": BISHOP, "R": ROOK, "Q": QUEEN,
               "K": KING}


def from_fen(fen: str) -> ChessState:
    """Build a ChessState from a FEN string (for tests, analysis, GUIs)."""
    parts = fen.split()
    placement, side = parts[0], parts[1]
    castle = parts[2] if len(parts) > 2 else "-"
    ep_s = parts[3] if len(parts) > 3 else "-"
    half = int(parts[4]) if len(parts) > 4 else 0
    full = int(parts[5]) if len(parts) > 5 else 1
    board = np.zeros((8, 8), np.int8)
    for r, row in enumerate(placement.split("/")):
        f = 0
        for ch in row:
            if ch.isdigit():
                f += int(ch)
            else:
                code = _FEN_PIECES[ch.upper()]
                board[7 - r, f] = code if ch.isupper() else -code
                f += 1
    player = 0 if side == "w" else 1
    rights = np.array([c in castle for c in "KQkq"])
    ep = -1 if ep_s == "-" else (int(ep_s[1]) - 1) * 8 + (ord(ep_s[0]) - 97)
    turns = (full - 1) * 2 + player
    hist = jnp.zeros(HIST_LEN, jnp.uint32).at[min(half, HIST_LEN - 1)].set(
        _position_hash(jnp.asarray(board), jnp.asarray(rights),
                       jnp.int32(ep), jnp.int32(player)))
    return ChessState(
        board=jnp.asarray(board),
        castling=jnp.asarray(rights),
        ep=jnp.int32(ep),
        halfmove=jnp.int32(half),
        hist=hist,
        player=jnp.int32(player),
        turns=jnp.int32(turns),
        last_action=jnp.int32(-1),
    )


def to_fen(state: ChessState) -> str:
    inv = {v: k for k, v in _FEN_PIECES.items()}
    b = np.asarray(state.board)
    rows = []
    for r in range(7, -1, -1):
        row, run = "", 0
        for f in range(8):
            v = int(b[r, f])
            if v == 0:
                run += 1
                continue
            if run:
                row, run = row + str(run), 0
            ch = inv[abs(v)]
            row += ch if v > 0 else ch.lower()
        if run:
            row += str(run)
        rows.append(row)
    side = "w" if int(state.player) == 0 else "b"
    rights = "".join(c for c, on in zip("KQkq", np.asarray(state.castling))
                     if on) or "-"
    ep = int(state.ep)
    ep_s = "-" if ep < 0 else chr(97 + ep % 8) + str(ep // 8 + 1)
    full = int(state.turns) // 2 + 1
    return (f"{'/'.join(rows)} {side} {rights} {ep_s} "
            f"{int(state.halfmove)} {full}")


def action_to_uci(state: ChessState, action: int) -> str:
    plane, from_sq = action % NUM_PLANES, action // NUM_PLANES
    fr, ff = from_sq // 8, from_sq % 8
    white = int(state.player) == 0
    dr = int(_tdr[plane]) * (1 if white or not _tunder[plane] else -1)
    tr, tf = fr + dr, ff + int(_tdf[plane])
    s = chr(97 + ff) + str(fr + 1) + chr(97 + tf) + str(tr + 1)
    piece = int(np.asarray(state.board)[fr, ff])
    if abs(piece) == PAWN and tr in (0, 7):
        s += {QUEEN: "q", KNIGHT: "n", BISHOP: "b", ROOK: "r"}[
            int(_tpromo[plane])]
    return s


def uci_to_action(state: ChessState, uci: str) -> int:
    ff, fr = ord(uci[0]) - 97, int(uci[1]) - 1
    tf, tr = ord(uci[2]) - 97, int(uci[3]) - 1
    dr, df = tr - fr, tf - ff
    promo = uci[4] if len(uci) > 4 else ""
    if promo and promo != "q":
        code = {"n": KNIGHT, "b": BISHOP, "r": ROOK}[promo]
        u = UNDER_DF.index(df)
        plane = 64 + u * 3 + UNDER_PROMO.index(code)
    elif (dr, df) in KNIGHT_DELTAS and abs(
            int(np.asarray(state.board)[fr, ff])) == KNIGHT:
        plane = 56 + KNIGHT_DELTAS.index((dr, df))
    else:
        k = max(abs(dr), abs(df))
        d = (dr // k, df // k)
        plane = DIRS.index(d) * 7 + k - 1
    return (fr * 8 + ff) * NUM_PLANES + plane
