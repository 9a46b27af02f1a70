"""Tafl (Viking chess) — brandubh 7x7 and hnefatafl 11x11 as JAX kernels.

Re-implements the reference fastafl engine + env adapters (reference:
fastafl/cengine.pyx:24-334, fastafl/variants.py:1-22,
alphazero/envs/brandubh/fastafl.pyx:31-268,
alphazero/envs/hnefatafl/fastafl.pyx) TPU-first:

* rook-ray legal moves: instead of per-piece while-loops, each (square,
  move-type) pair carries a precomputed "strictly between" mask; legality is
  two dense matvecs (blocked-count and destination-landability) — MXU work;
* custodial capture: 4 simultaneous direction checks (cengine.pyx:174-199);
* encirclement ("surround") capture: the reference's recursive group walk
  (cengine.pyx:207-247) becomes a bounded liberty flood-fill — an enemy group
  is captured iff no member reaches an empty *normal* tile (throne/escape
  tiles and board edges block);
* win state per cengine.pyx:146-169 with the env adapter's draw-move cap and
  player mapping (fastafl.pyx:190-202: player 0 = the '2' team, which moves
  first; player 1 = the '1'+king team).

Cell encoding matches the reference exactly: 0 empty, 1 white soldier,
2 black soldier, 3 king, 4 throne, 5 escape, 7 king-on-throne,
8 king-on-escape (cengine.pyx:24-32).

Documented deviations from the reference engine:
* cengine.pyx:189 lets a *white* move custodially capture white's own king
  when ``king_two_sided_capture`` is set (the do_capture test ignores the
  mover's team). Here only black movers capture the king — the sane rule.
(The team stuck-checks go through cengine's _get_team override, so team 1's
check includes the king's moves — cengine.pyx:163-167, 277-284.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_general_tpu.envs.core import Env

EMPTY, WHITE, BLACK, KING, THRONE, ESCAPE = 0, 1, 2, 3, 4, 5
KING_ON_THRONE, KING_ON_ESCAPE = 7, 8
KING_VALUES = (KING, KING_ON_THRONE, KING_ON_ESCAPE)

HNEFATAFL_BOARD = """50022222005
00000200000
00000000000
20000100002
20001110002
22011711022
20001110002
20000100002
00000000000
00000200000
50022222005"""

BRANDUBH_BOARD = """5002005
0002000
0001000
2217122
0001000
0002000
5002005"""


@struct.dataclass
class TaflState:
    board: jnp.ndarray  # int8[H, W], reference cell encoding
    player: jnp.ndarray  # int32: 0 = black ('2' team, moves first), 1 = white
    turns: jnp.ndarray
    last_action: jnp.ndarray
    king_captured: jnp.ndarray  # bool: set by custodial/surround king capture


def _parse_board(s: str) -> np.ndarray:
    rows = [list(map(int, line.strip())) for line in s.strip().splitlines()]
    return np.array(rows, dtype=np.int8)


def _build_tables(H: int, W: int):
    """Move-encoding tables (reference: fastafl.pyx:47-80).

    action = (W+H-2) * (c + r*W) + move_type; move_type < H-1 → vertical to
    row mt (+1 if mt >= r), else horizontal to col mt-(H-1) (+1 if >= c).
    """
    MT = W + H - 2
    dest_r = np.zeros((H, W, MT), np.int32)
    dest_c = np.zeros((H, W, MT), np.int32)
    between = np.zeros((H * W * MT, H * W), np.float32)
    dest_onehot = np.zeros((H * W * MT, H * W), np.float32)
    for r in range(H):
        for c in range(W):
            for mt in range(MT):
                if mt < H - 1:
                    r2 = mt + (1 if mt >= r else 0)
                    c2 = c
                else:
                    c2 = (mt - (H - 1)) + (1 if (mt - (H - 1)) >= c else 0)
                    r2 = r
                dest_r[r, c, mt] = r2
                dest_c[r, c, mt] = c2
                a = (c + r * W) * MT + mt
                dest_onehot[a, r2 * W + c2] = 1.0
                if r2 == r:
                    lo, hi = sorted((c, c2))
                    for cc in range(lo + 1, hi):
                        between[a, r * W + cc] = 1.0
                else:
                    lo, hi = sorted((r, r2))
                    for rr in range(lo + 1, hi):
                        between[a, rr * W + c] = 1.0
    return MT, dest_r, dest_c, between, dest_onehot


def _build_symmetry_perms(H: int, W: int, MT: int) -> np.ndarray:
    """Action-permutation tables for the 8 dihedral transforms.

    PERM[k, new_action] = old_action, so new_pi = pi[PERM[k]]; transform k
    enumerates (rot, flip) as rot*2 + flip with rot quarter-turns CCW
    (matching np.rot90 on the board planes) and flip = fliplr afterwards.
    """
    assert H == W, "dihedral symmetries require square boards"
    N = H

    def tf_cell(r, c, rot, flip):
        for _ in range(rot):
            r, c = N - 1 - c, r  # np.rot90 CCW: out[N-1-c, r] = in[r, c]
        if flip:
            c = N - 1 - c
        return r, c

    def encode(r, c, r2, c2):
        if c == c2:
            mt = r2 if r2 < r else r2 - 1
        else:
            mt = (N - 1) + (c2 if c2 < c else c2 - 1)
        return (c + r * N) * MT + mt

    A = N * N * MT
    perms = np.zeros((8, A), np.int64)
    for rot in range(4):
        for flip in (False, True):
            k = rot * 2 + int(flip)
            for r in range(N):
                for c in range(N):
                    for mt in range(MT):
                        if mt < N - 1:
                            r2, c2 = mt + (1 if mt >= r else 0), c
                        else:
                            cc = mt - (N - 1)
                            r2, c2 = r, cc + (1 if cc >= c else 0)
                        old_a = (c + r * N) * MT + mt
                        nr, nc = tf_cell(r, c, rot, flip)
                        nr2, nc2 = tf_cell(r2, c2, rot, flip)
                        new_a = encode(nr, nc, nr2, nc2)
                        perms[k, new_a] = old_a
    return perms


def _build_scan_tables(H: int, W: int):
    """Static index tables for the prefix-sum movegen (see _ok_pair "scan"
    impl): for each (source row, vertical move type) the exclusive-between
    cumsum bounds and destination row; likewise for columns."""
    MTv, MTh = H - 1, W - 1
    r2v = np.array([[mt + (1 if mt >= r else 0) for mt in range(MTv)]
                    for r in range(H)], np.int32)           # [H, MTv]
    rsrc = np.arange(H, dtype=np.int32)[:, None]
    V_HI = np.maximum(r2v, rsrc)                             # sum rows < HI
    V_LO1 = np.minimum(r2v, rsrc) + 1                        # ... >= LO+1
    c2h = np.array([[cc + (1 if cc >= c else 0) for cc in range(MTh)]
                    for c in range(W)], np.int32)           # [W, MTh]
    csrc = np.arange(W, dtype=np.int32)[:, None]
    H_HI = np.maximum(c2h, csrc)
    H_LO1 = np.minimum(c2h, csrc) + 1
    return r2v, V_HI, V_LO1, c2h, H_HI, H_LO1


def make_tafl_env(name: str, board_str: str, king_two_sided_capture: bool,
                  draw_move_count: int, move_over_throne: bool = True,
                  king_can_enter_throne: bool = False,
                  movegen: str = "dense"):
    """Build a tafl Env class for a variant (reference: cengine.pyx:54-57
    rule flags, variants.py board strings).

    ``movegen``: 'dense' (default) uses the [A, H·W] between/destination
    mask matmuls; 'scan' computes path legality with row/col obstacle prefix
    sums + tiny static gathers — O(H·W·MT) arithmetic, ~100x fewer FLOPs.
    Both are exact (playout-equality tests). Measured head-to-head on the
    TPU (results/r2/tafl_profile.py, B=512 raw search): dense 227.5k
    sims/s vs scan 211.9k — the vmapped mask matvecs batch into [A,H·W] x
    [H·W,B] MXU matmuls while the prefix-sum gathers are VPU-serial, so the
    arithmetic saving never materializes. Dense is therefore the default;
    scan remains for CPU/debug (it wins when there is no MXU)."""
    INIT = _parse_board(board_str)
    H, W = INIT.shape
    MT, DEST_R, DEST_C, BETWEEN, DEST_OH = _build_tables(H, W)
    PERMS = _build_symmetry_perms(H, W, MT)
    A = H * W * MT
    NUM_BLACK = int((INIT == BLACK).sum())
    NUM_WHITE = int((INIT == WHITE).sum())

    between_bf = jnp.asarray(BETWEEN, jnp.bfloat16)
    dest_oh_bf = jnp.asarray(DEST_OH, jnp.bfloat16)
    dest_r_j = jnp.asarray(DEST_R.reshape(-1))
    dest_c_j = jnp.asarray(DEST_C.reshape(-1))
    perms_j = jnp.asarray(PERMS)

    R2V, V_HI, V_LO1, C2H, H_HI, H_LO1 = _build_scan_tables(H, W)
    r2v_j, v_hi_j, v_lo1_j = map(jnp.asarray, (R2V, V_HI, V_LO1))
    c2h_j, h_hi_j, h_lo1_j = map(jnp.asarray, (C2H, H_HI, H_LO1))

    def _is_king(v):
        return (v == KING) | (v == KING_ON_THRONE) | (v == KING_ON_ESCAPE)

    def _team1(v):  # white + king
        return (v == WHITE) | _is_king(v)

    def _ok_dense(pass_mask, land_mask):
        """[A, H·W] mask-matmul legality (round-1 kernels): blocked-count
        and destination-landability matvecs. bf16 is exact here: blocker
        counts are small integers (≤ pieces on a line ≪ 256)."""
        obstacles = (~pass_mask).astype(jnp.bfloat16).reshape(-1)
        blocked = between_bf @ obstacles  # [A] count of blockers between
        landable = dest_oh_bf @ land_mask.astype(jnp.bfloat16).reshape(-1)
        return (blocked < 0.5) & (landable > 0.5)

    def _ok_dense_pair(pass_nk, land_nk, pass_k, land_k):
        """Both movers' legality in ONE pair of [A, H·W] x [H·W, 2]
        matmuls (stacked rhs) — under vmap this lowers to [A, H·W] x
        [H·W, 2B] MXU matmuls instead of four separate matvec batches."""
        obst = jnp.stack(
            [(~pass_nk).reshape(-1), (~pass_k).reshape(-1)], axis=-1
        ).astype(jnp.bfloat16)                                   # [H·W, 2]
        land = jnp.stack(
            [land_nk.reshape(-1), land_k.reshape(-1)], axis=-1
        ).astype(jnp.bfloat16)
        blocked = between_bf @ obst                              # [A, 2]
        landable = dest_oh_bf @ land
        ok = (blocked < 0.5) & (landable > 0.5)
        return ok[:, 0], ok[:, 1]

    def _ok_scan(pass_mask, land_mask):
        """Prefix-sum legality: blockers between source and destination read
        off row/col obstacle cumsums with static [H, MT]-shaped gathers —
        O(H·W·MT) VPU work instead of the [A, H·W] matmuls (~100x less
        arithmetic at hnefatafl scale, and no MXU contention with the
        network). Exact: counts are small integers."""
        obst = (~pass_mask).astype(jnp.int32)
        # vertical moves: S[k, c] = #obstacles in rows < k of column c
        S = jnp.concatenate(
            [jnp.zeros((1, W), jnp.int32), jnp.cumsum(obst, axis=0)], axis=0)
        blocked_v = jnp.take(S, v_hi_j, axis=0) - jnp.take(S, v_lo1_j, axis=0)
        ok_v = (blocked_v == 0) & jnp.take(land_mask, r2v_j, axis=0)
        # horizontal moves: T[r, k] = #obstacles in cols < k of row r
        T = jnp.concatenate(
            [jnp.zeros((H, 1), jnp.int32), jnp.cumsum(obst, axis=1)], axis=1)
        blocked_h = jnp.take(T, h_hi_j, axis=1) - jnp.take(T, h_lo1_j, axis=1)
        ok_h = (blocked_h == 0) & jnp.take(land_mask, c2h_j, axis=1)
        # action layout: a = (r*W + c) * MT + mt, vertical types first
        return jnp.concatenate(
            [ok_v.transpose(0, 2, 1), ok_h], axis=-1).reshape(A)

    _ok_impl = _ok_scan if movegen == "scan" else _ok_dense

    def _ok_pair(board):
        """Board-only move legality ([A] for non-king movers, [A] for the
        king): blocked-path + landable-destination tests. Independent of
        WHICH pieces move — mover masks only select source rows — so one
        pair serves both teams' movegen AND the stuck-team checks."""
        pass_nk = (board == EMPTY) | (
            (board == THRONE) if move_over_throne else (board == EMPTY)
        )
        pass_k = pass_nk | (board == ESCAPE)
        land_nk = board == EMPTY
        land_k = land_nk | (board == ESCAPE) | (
            (board == THRONE) if king_can_enter_throne else (board == EMPTY)
        )
        if movegen == "dense":
            return _ok_dense_pair(pass_nk, land_nk, pass_k, land_k)
        return _ok_impl(pass_nk, land_nk), _ok_impl(pass_k, land_k)

    def _select_movers(ok_nk, ok_k, movers_nonking, movers_king):
        src_nk = jnp.repeat(movers_nonking.reshape(-1), MT)
        src_k = jnp.repeat(movers_king.reshape(-1), MT)
        return (src_nk & ok_nk) | (src_k & ok_k)

    def _valid_from_masks(board, movers_nonking, movers_king):
        """Flat bool[A] of legal moves for given mover masks."""
        ok_nk, ok_k = _ok_pair(board)
        return _select_movers(ok_nk, ok_k, movers_nonking, movers_king)

    def _team_has_moves(board, team1: bool):
        """Any legal move for a whole team (cengine.pyx:163-167 via
        has_legal_moves → _get_team, cengine.pyx:277-284: team 1 includes
        the king)."""
        if team1:
            movers_nk = board == WHITE
            movers_k = _is_king(board)
        else:
            movers_nk = board == BLACK
            movers_k = jnp.zeros_like(movers_nk)
        return jnp.any(_valid_from_masks(board, movers_nk, movers_k))

    def _king_surrounded(board):
        """4-side king capture (cengine.pyx:154-161): every in-bounds
        neighbor of the king is a black soldier / throne / escape."""
        hostile = (board == BLACK) | (board == THRONE) | (board == ESCAPE)
        # Pad with hostile so out-of-bounds neighbors are vacuously true.
        hp = jnp.pad(hostile, 1, constant_values=True)
        all_hostile = (
            hp[:-2, 1:-1] & hp[2:, 1:-1] & hp[1:-1, :-2] & hp[1:-1, 2:]
        )
        king = _is_king(board)
        return jnp.any(king & all_hostile)

    def _dilate(m):
        mp = jnp.pad(m, 1, constant_values=False)
        return mp[:-2, 1:-1] | mp[2:, 1:-1] | mp[1:-1, :-2] | mp[1:-1, 2:]

    def _flood(seed, region):
        """Grow ``seed`` through 4-connected ``region`` to a fixpoint.

        Each while trip grows FOUR hops (unrolled dilations — growth past
        the fixpoint is idempotent, so exactness is preserved): typical
        capture groups converge in one trip, and under vmap the loop runs
        max-trips-across-batch, so fewer, fatter trips cut the serialized
        while_loop overhead that dominates the step kernel."""

        def cond(carry):
            _, changed = carry
            return changed

        def body(carry):
            reach, _ = carry
            grown = reach
            for _ in range(4):
                grown = region & (grown | _dilate(grown))
            return grown, jnp.any(grown != reach)

        reach, _ = jax.lax.while_loop(cond, body, (seed & region,
                                                   jnp.bool_(True)))
        return reach

    def _surround_capture(board, mover_is_team1, dest_mask):
        """Zero-liberty enemy-group capture (cengine.pyx:207-247).

        Returns (new_board, king_captured_by_surround). Liberties are empty
        *normal* tiles; throne/escape tiles and board edges block. Like the
        reference, only groups touching the moved piece are captured
        (cengine.pyx:229-231 starts from the mover's enemy neighbors).
        """
        enemy = jnp.where(mover_is_team1, board == BLACK, _team1(board))
        liberty = board == EMPTY
        reach = _flood(enemy & _dilate(liberty), enemy)
        zero_liberty = enemy & ~reach
        captured = _flood(zero_liberty & _dilate(dest_mask), zero_liberty)
        king_taken = jnp.any(captured & _is_king(board))
        # Remove captured non-king pieces; a captured king stays on the board
        # with the flag set (cengine.pyx:242-245).
        remove = captured & ~_is_king(board)
        new_board = jnp.where(remove, jnp.int8(EMPTY), board)
        return new_board, king_taken

    class Tafl(Env):
        NAME = name
        NUM_PLAYERS = 2
        ACTION_SIZE = A
        OBS_SHAPE = (5, H, W)
        MAX_TURNS = draw_move_count
        HAS_DRAW = True
        NUM_SYMMETRIES = 8
        BOARD_SHAPE = (H, W)
        MOVE_TYPES = MT

        State = TaflState

        @staticmethod
        def init() -> TaflState:
            return TaflState(
                board=jnp.asarray(INIT),
                player=jnp.int32(0),
                turns=jnp.int32(0),
                last_action=jnp.int32(-1),
                king_captured=jnp.bool_(False),
            )

        @staticmethod
        def step(state: TaflState, action) -> TaflState:
            action = jnp.asarray(action, jnp.int32)
            board = state.board
            cell = action // MT
            r, c = cell // W, cell % W
            r2 = dest_r_j[action]
            c2 = dest_c_j[action]

            src_val = board[r, c]
            piece = jnp.where(_is_king(src_val), jnp.int8(KING),
                              src_val.astype(jnp.int8))
            src_left = jnp.where(
                src_val == KING_ON_THRONE, jnp.int8(THRONE),
                jnp.where(src_val == KING_ON_ESCAPE, jnp.int8(ESCAPE),
                          jnp.int8(EMPTY)),
            )
            board = board.at[r, c].set(src_left)
            dst_tile = board[r2, c2]
            landed = jnp.where(
                (piece == KING) & (dst_tile == THRONE), jnp.int8(KING_ON_THRONE),
                jnp.where((piece == KING) & (dst_tile == ESCAPE),
                          jnp.int8(KING_ON_ESCAPE), piece),
            )
            board = board.at[r2, c2].set(landed)

            # --- custodial capture (cengine.pyx:174-199) -------------------
            mover_team1 = _team1(landed) | (piece == KING)
            enemy_soldier = jnp.where(mover_team1, jnp.int8(BLACK),
                                      jnp.int8(WHITE))
            king_captured = state.king_captured
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                er, ec = r2 + dr, c2 + dc
                fr, fc = r2 + 2 * dr, c2 + 2 * dc
                e_in = (0 <= er) & (er < H) & (0 <= ec) & (ec < W)
                f_in = (0 <= fr) & (fr < H) & (0 <= fc) & (fc < W)
                ev = board[jnp.clip(er, 0, H - 1), jnp.clip(ec, 0, W - 1)]
                fv = board[jnp.clip(fr, 0, H - 1), jnp.clip(fc, 0, W - 1)]
                friendly = jnp.where(
                    mover_team1, _team1(fv), fv == BLACK
                ) | (fv == THRONE) | (fv == ESCAPE)
                # Two-sided king custodial capture: only by black movers
                # (deviation from cengine.pyx:189 — see module docstring).
                take_king = (
                    bool(king_two_sided_capture)
                    & ~mover_team1
                    & (ev == KING)
                )
                plain = ev == enemy_soldier
                do = e_in & f_in & friendly & (plain | take_king)
                board = jnp.where(
                    do & plain,
                    board.at[jnp.clip(er, 0, H - 1),
                             jnp.clip(ec, 0, W - 1)].set(jnp.int8(EMPTY)),
                    board,
                )
                king_captured = king_captured | (do & take_king)

            # --- surround capture (cengine.pyx:228-247) --------------------
            dest_mask = jnp.zeros((H, W), jnp.bool_).at[r2, c2].set(True)
            board, king_surr = _surround_capture(board, mover_team1, dest_mask)
            king_captured = king_captured | king_surr

            return TaflState(
                board=board,
                player=(state.player + 1) % 2,
                turns=state.turns + 1,
                last_action=action,
                king_captured=king_captured,
            )

        @staticmethod
        def valid_moves(state: TaflState) -> jnp.ndarray:
            board = state.board
            is_black = state.player == 0
            movers_nk = jnp.where(is_black, board == BLACK, board == WHITE)
            movers_k = jnp.where(is_black, jnp.zeros((H, W), jnp.bool_),
                                 _is_king(board))
            return _valid_from_masks(board, movers_nk, movers_k)

        @staticmethod
        def win_state(state: TaflState) -> jnp.ndarray:
            board = state.board
            # Draw-move cap first (fastafl.pyx:193-197).
            draw = state.turns >= draw_move_count

            king_escaped = jnp.any(board == KING_ON_ESCAPE)
            black_stuck = ~_team_has_moves(board, team1=False)
            white_wins = king_escaped | black_stuck

            if king_two_sided_capture:
                king_taken = state.king_captured
            else:
                king_taken = state.king_captured | _king_surrounded(board)
            white_stuck = ~_team_has_moves(board, team1=True)
            black_wins = (king_taken | white_stuck) & ~white_wins

            result = jnp.stack([
                black_wins & ~draw,
                white_wins & ~draw,
                draw,
            ]).astype(jnp.float32)
            return result

        @staticmethod
        def win_and_valids(state: TaflState):
            """Fused win_state + valid_moves: the board-only legality masks
            (_ok_pair) are computed once and reused for both teams' movegen
            and the stuck-team win conditions. Results are identical to the
            separate calls; the search's leaf expansion consumes this
            (mcts/tree.py _win_valids). Note: measured-neutral under jit on
            TPU — XLA already CSE-dedups the identical movegen
            subexpressions across win_state/valid_moves in one fusion — but
            the single-evaluation contract is explicit here rather than an
            optimizer artifact, and it pays off for any non-fused caller.
            """
            board = state.board
            ok_nk, ok_k = _ok_pair(board)
            vm_black = _select_movers(ok_nk, ok_k, board == BLACK,
                                      jnp.zeros((H, W), jnp.bool_))
            vm_white = _select_movers(ok_nk, ok_k, board == WHITE,
                                      _is_king(board))
            valids = jnp.where(state.player == 0, vm_black, vm_white)

            draw = state.turns >= draw_move_count
            king_escaped = jnp.any(board == KING_ON_ESCAPE)
            black_stuck = ~jnp.any(vm_black)
            white_wins = king_escaped | black_stuck
            if king_two_sided_capture:
                king_taken = state.king_captured
            else:
                king_taken = state.king_captured | _king_surrounded(board)
            white_stuck = ~jnp.any(vm_white)
            black_wins = (king_taken | white_stuck) & ~white_wins
            win = jnp.stack([
                black_wins & ~draw,
                white_wins & ~draw,
                draw,
            ]).astype(jnp.float32)
            return win, valids

        @staticmethod
        def observation(state: TaflState) -> jnp.ndarray:
            """5 planes: black, white soldiers, king, turn colour, turn
            number (fastafl.pyx:84-99)."""
            board = state.board
            black = (board == BLACK).astype(jnp.float32)
            white = (board == WHITE).astype(jnp.float32)
            king = _is_king(board).astype(jnp.float32)
            colour = jnp.full((H, W), state.player, jnp.float32)
            turn = jnp.full((H, W), state.turns / draw_move_count, jnp.float32)
            return jnp.stack([black, white, king, colour, turn])

        @classmethod
        def symmetries(cls, obs: jnp.ndarray, pi: jnp.ndarray):
            obs_list, pi_list = [], []
            for rot in range(4):
                for flip in (False, True):
                    o = jnp.rot90(obs, rot, axes=(1, 2))
                    if flip:
                        o = o[:, :, ::-1]
                    obs_list.append(o)
                    pi_list.append(pi[perms_j[rot * 2 + int(flip)]])
            return jnp.stack(obs_list), jnp.stack(pi_list)

        @staticmethod
        def crude_value(state: TaflState) -> jnp.ndarray:
            """Heuristic value, 1 good for black (fastafl.pyx:258-268)."""
            result = Tafl.win_state(state)
            white = jnp.sum(state.board == WHITE).astype(jnp.float32)
            black = jnp.sum(state.board == BLACK).astype(jnp.float32)
            sign = jnp.where(state.player == 0, 1.0, -1.0)
            denom = 100.0 + jnp.where(state.player == 0, NUM_BLACK, NUM_WHITE)
            return 0.5 + (
                sign * (-result[2] * 10.0 - state.turns / draw_move_count)
                + black - white + 100.0 * (result[0] - result[1])
            ) / denom

        @classmethod
        def display(cls, state: TaflState) -> str:
            chars = {0: ".", 1: "w", 2: "b", 3: "K", 4: "+", 5: "x",
                     7: "K", 8: "K"}
            board = np.asarray(state.board)
            return "\n".join(
                " ".join(chars[int(v)] for v in row) for row in board
            )

        @staticmethod
        def decode_action(action: int):
            """action → ((r, c), (r2, c2)) for display/tests."""
            cell, mt = divmod(int(action), MT)
            r, c = divmod(cell, W)
            return (r, c), (int(DEST_R[r, c, mt]), int(DEST_C[r, c, mt]))

        @staticmethod
        def encode_action(r: int, c: int, r2: int, c2: int) -> int:
            if c == c2:
                mt = r2 if r2 < r else r2 - 1
            else:
                mt = (H - 1) + (c2 if c2 < c else c2 - 1)
            return (c + r * W) * MT + mt

    Tafl.__name__ = name.capitalize()
    return Tafl


Brandubh = make_tafl_env("brandubh", BRANDUBH_BOARD,
                         king_two_sided_capture=True, draw_move_count=100)
Hnefatafl = make_tafl_env("hnefatafl", HNEFATAFL_BOARD,
                          king_two_sided_capture=False, draw_move_count=512)

Game = Hnefatafl
