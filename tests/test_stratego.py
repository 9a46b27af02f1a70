"""Stratego rules tests (reference ships none — SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs.stratego import (
    ACTION_SIZE,
    BOMB,
    CELLS,
    DRAW_MOVE_COUNT,
    FLAG,
    LAKE,
    MARSHAL,
    MINER,
    MT,
    PIECE_COUNTS,
    PLACEMENT_TURNS,
    SCOUT,
    SPY,
    TEAM_OFFSET,
    VISIBLE_OFFSET,
    H,
    W,
    Stratego,
    _START,
)


def place_action(piece, r, c):
    return piece * CELLS + r * W + c


def move_action(r, c, r2, c2):
    if c == c2:
        mt = r2 if r2 < r else r2 - 1
    else:
        mt = (H - 1) + (c2 if c2 < c else c2 - 1)
    return (c + r * W) * MT + mt


def movement_state(pieces, player=0, turns=PLACEMENT_TURNS):
    """Build a movement-phase state; pieces = {(r, c): value}."""
    board = _START.copy()
    for (r, c), v in pieces.items():
        board[r, c] = v
    s = Stratego.init()
    zero = jnp.zeros_like(s.red_to_place)
    return s.replace(
        board=jnp.asarray(board),
        red_to_place=zero,
        blue_to_place=zero,
        player=jnp.int32(player),
        turns=jnp.int32(turns),
    )


class TestPlacement:
    def test_initial_valids_are_red_zone(self):
        s = Stratego.init()
        v = np.asarray(Stratego.valid_moves(s))
        acts = np.flatnonzero(v)
        assert len(acts) > 0
        for a in acts:
            piece, cell = divmod(a, CELLS)
            r = cell // W
            assert 1 <= piece <= 12
            assert r < 3, "red places in rows 0-2"

    def test_blue_zone_after_one_placement(self):
        s = Stratego.init()
        s = Stratego.step(s, place_action(SCOUT, 0, 0))
        v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
        for a in v:
            r = (a % CELLS) // W
            assert r > 4, "blue places in rows 5-7"

    def test_piece_counts_deplete(self):
        s = Stratego.init()
        # Red has exactly 1 spy: after placing it, no spy placements remain.
        s = Stratego.step(s, place_action(SPY, 0, 0))
        s = Stratego.step(s, place_action(SPY, 7, 0))  # blue spy
        v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
        pieces = {a // CELLS for a in v}
        assert SPY not in pieces
        assert SCOUT in pieces

    @pytest.mark.slow
    def test_full_placement_reaches_move_phase(self):
        s = Stratego.init()
        rng = np.random.default_rng(0)
        for t in range(PLACEMENT_TURNS):
            v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
            assert len(v) > 0, f"no placement actions at turn {t}"
            s = Stratego.step(s, int(rng.choice(v)))
        assert int(s.turns) == PLACEMENT_TURNS
        assert int(jnp.sum(s.red_to_place)) == 0
        assert int(jnp.sum(s.blue_to_place)) == 0
        board = np.asarray(s.board)
        reds = ((board % VISIBLE_OFFSET >= 1)
                & (board % VISIBLE_OFFSET <= 12)).sum()
        assert reds == 30
        # Movement-phase valids non-empty and well-formed.
        v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
        assert len(v) > 0
        assert not np.asarray(Stratego.win_state(s)).any()


class TestMovement:
    def test_one_step_moves_only_for_non_scouts(self):
        s = movement_state({(0, 0): MINER, (7, 9): MINER + TEAM_OFFSET})
        v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
        assert set(v) == {move_action(0, 0, 1, 0), move_action(0, 0, 0, 1)}

    def test_scout_rides(self):
        s = movement_state({(0, 0): SCOUT, (7, 9): MINER + TEAM_OFFSET})
        v = set(np.flatnonzero(np.asarray(Stratego.valid_moves(s))))
        # Down column 0 to rows 1..7, right along row 0 to cols 1..9.
        expected = {move_action(0, 0, r, 0) for r in range(1, 8)}
        expected |= {move_action(0, 0, 0, c) for c in range(1, 10)}
        assert v == expected

    def test_scout_blocked_by_lake_and_pieces(self):
        s = movement_state({
            (3, 0): SCOUT, (3, 5): MINER, (7, 9): MINER + TEAM_OFFSET,
        })
        v = set(np.flatnonzero(np.asarray(Stratego.valid_moves(s))))
        # Row 3 has lakes at cols 2,3: scout at (3,0) can ride right only to
        # col 1; lake blocks further.
        assert move_action(3, 0, 3, 1) in v
        assert move_action(3, 0, 3, 2) not in v
        assert move_action(3, 0, 3, 4) not in v

    def test_scout_captures_at_first_enemy_only(self):
        s = movement_state({
            (0, 0): SCOUT,
            (0, 4): MINER + TEAM_OFFSET,
            (0, 6): MINER + TEAM_OFFSET,
            (7, 0): FLAG,  # red flag so red not stuck-checked oddly
        })
        v = set(np.flatnonzero(np.asarray(Stratego.valid_moves(s))))
        assert move_action(0, 0, 0, 4) in v  # capture first enemy
        assert move_action(0, 0, 0, 5) not in v  # cannot jump past
        assert move_action(0, 0, 0, 6) not in v

    def test_bombs_and_flags_cannot_move(self):
        s = movement_state({
            (0, 0): BOMB, (0, 5): FLAG, (2, 2): MINER,
            (7, 9): MINER + TEAM_OFFSET,
        })
        v = np.flatnonzero(np.asarray(Stratego.valid_moves(s)))
        srcs = {(a // MT) // W * 10 + (a // MT) % W for a in v}
        assert 0 not in srcs and 5 not in srcs


class TestCombat:
    def check(self, attacker, defender, want_dest):
        s = movement_state({(2, 0): attacker, (3, 0): defender,
                            (7, 9): FLAG + TEAM_OFFSET, (0, 9): FLAG})
        s2 = Stratego.step(s, move_action(2, 0, 3, 0))
        got = int(np.asarray(s2.board)[3, 0])
        assert got == want_dest, f"{attacker}->{defender}: {got} != {want_dest}"
        return s2

    def test_higher_rank_wins_attacking(self):
        self.check(MARSHAL, MINER + TEAM_OFFSET, MARSHAL + VISIBLE_OFFSET)

    def test_lower_rank_loses_attacking(self):
        self.check(MINER, MARSHAL + TEAM_OFFSET,
                   MARSHAL + TEAM_OFFSET + VISIBLE_OFFSET)

    def test_equal_ranks_both_die(self):
        s2 = self.check(MINER, MINER + TEAM_OFFSET, 0)
        assert not np.asarray(s2.red_bombs).any()

    def test_spy_beats_marshal(self):
        self.check(SPY, MARSHAL + TEAM_OFFSET, SPY + VISIBLE_OFFSET)

    def test_marshal_beats_spy_when_attacking(self):
        self.check(MARSHAL, SPY + TEAM_OFFSET, MARSHAL + VISIBLE_OFFSET)

    def test_bomb_explodes_on_non_miner(self):
        s2 = self.check(MARSHAL, BOMB + TEAM_OFFSET, 0)
        assert np.asarray(s2.blue_bombs)[3, 0]
        obs = np.asarray(Stratego.observation(s2))
        assert obs[27, 3, 0] == 1.0  # blue exploded-bomb plane

    def test_miner_vs_bomb_reference_behavior(self):
        # Reference quirk (see module docstring): the miner LOSES; the bomb
        # stays, visible.
        self.check(MINER, BOMB + TEAM_OFFSET,
                   BOMB + TEAM_OFFSET + VISIBLE_OFFSET)

    def test_flag_capture_wins(self):
        s = movement_state({(2, 0): MINER, (3, 0): FLAG + TEAM_OFFSET,
                            (0, 9): FLAG, (7, 9): MINER + TEAM_OFFSET})
        s2 = Stratego.step(s, move_action(2, 0, 3, 0))
        assert bool(s2.blue_flag_captured)
        w = np.asarray(Stratego.win_state(s2))
        np.testing.assert_array_equal(w, [1, 0, 0])  # red (player 0) wins

    def test_visibility_dropped_on_move(self):
        # A visible piece that moves becomes hidden again (engine.pyx:93-94).
        s = movement_state({(2, 0): MINER + VISIBLE_OFFSET,
                            (0, 9): FLAG, (7, 9): FLAG + TEAM_OFFSET})
        s2 = Stratego.step(s, move_action(2, 0, 2, 1))
        assert int(np.asarray(s2.board)[2, 1]) == MINER


class TestWinAndDraw:
    def test_stuck_red_loses(self):
        # Red has only a bomb and flag → no moves → blue wins.
        s = movement_state({(0, 0): BOMB, (0, 1): FLAG,
                            (7, 9): MINER + TEAM_OFFSET})
        w = np.asarray(Stratego.win_state(s))
        np.testing.assert_array_equal(w, [0, 1, 0])

    def test_draw_at_cap(self):
        s = movement_state({(0, 0): MINER, (7, 9): MINER + TEAM_OFFSET},
                           turns=DRAW_MOVE_COUNT)
        w = np.asarray(Stratego.win_state(s))
        np.testing.assert_array_equal(w, [0, 0, 1])


class TestSymmetries:
    def test_movement_mirror(self):
        s = movement_state({(2, 1): MINER, (0, 9): FLAG,
                            (7, 9): FLAG + TEAM_OFFSET})
        obs = Stratego.observation(s)
        pi = np.zeros(ACTION_SIZE, np.float32)
        pi[move_action(2, 1, 2, 2)] = 1.0
        obs_k, pi_k = Stratego.symmetries(obs, jnp.asarray(pi))
        pi_m = np.asarray(pi_k[1])
        # Mirrored move: (2, 8) → (2, 7).
        assert pi_m[move_action(2, 8, 2, 7)] == 1.0
        np.testing.assert_array_equal(
            np.asarray(obs_k[1]), np.asarray(obs)[:, :, ::-1]
        )

    def test_placement_mirror(self):
        s = Stratego.init()
        obs = Stratego.observation(s)
        pi = np.zeros(ACTION_SIZE, np.float32)
        pi[place_action(SCOUT, 0, 0)] = 1.0
        _, pi_k = Stratego.symmetries(obs, jnp.asarray(pi))
        pi_m = np.asarray(pi_k[1])
        assert pi_m[place_action(SCOUT, 0, W - 1)] == 1.0
