"""Env rule tests.

Ports the reference's golden connect4 cases (reference:
alphazero/envs/connect4/test_connect4.py:31-167 — stale there, live here) to
the functional API, plus vmap/jit lockstep checks the reference could not
express.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.envs.tictactoe import TicTacToe


def play_moves(env, moves):
    s = env.init()
    for m in moves:
        s = env.step(s, m)
    return s


def board_from_array(arr):
    s = Connect4.init()
    board = jnp.asarray(np.array(arr, dtype=np.int8))
    return s.replace(board=board, turns=jnp.int32(int(np.sum(np.abs(arr)))))


class TestConnect4:
    def test_simple_moves(self):
        # Players alternate: player 0 plays +1 stones, player 1 plays -1.
        s = play_moves(Connect4, [4, 5, 4, 3, 0, 6])
        expected = np.array(
            [[0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, 0, 1, 0, 0],
             [1, 0, 0, -1, 1, -1, -1]], dtype=np.int8)
        np.testing.assert_array_equal(np.asarray(s.board), expected)
        assert int(s.turns) == 6
        assert int(s.player) == 0

    def test_valid_moves(self):
        cases = [
            ([], [True] * 7),
            ([0, 1, 2, 3, 4, 5, 6], [True] * 7),
            ([0, 1, 2, 3, 4, 5, 6] * 5, [True] * 7),
            ([0, 1, 2, 3, 4, 5, 6] * 6, [False] * 7),
            ([0, 1, 2] * 3 + [3, 4, 5, 6] * 6, [True] * 3 + [False] * 4),
        ]
        for moves, expected in cases:
            s = play_moves(Connect4, moves)
            np.testing.assert_array_equal(
                np.asarray(Connect4.valid_moves(s)), np.array(expected)
            )

    def test_win_states(self):
        # (board, expected win vector [p0, p1, draw]); boards embedded on 6x7.
        zeros = np.zeros((6, 7), dtype=np.int8)
        diag_p0 = np.zeros((6, 7), dtype=np.int8)
        for i in range(4):
            diag_p0[1 + i, 5 - i] = 1  # anti-diagonal win for player 0
        diag2_p0 = np.zeros((6, 7), dtype=np.int8)
        for i in range(4):
            diag2_p0[1 + i, 2 + i] = 1  # main-diagonal win
        diag_p1 = np.zeros((6, 7), dtype=np.int8)
        for i in range(4):
            diag_p1[i, 3 - i] = -1
        ongoing = np.array(
            [[0, 0, 0, 0, 0, 0, 0],
             [0, 0, 0, -1, 0, 0, 0],
             [0, 0, 0, -1, 0, 0, 1],
             [0, 0, 0, 1, 1, -1, -1],
             [0, 0, 0, -1, 1, 1, 1],
             [0, -1, 0, -1, 1, -1, 1]], dtype=np.int8)
        col_p0 = np.array(
            [[0, 0, 0, 1, 0, 0, 0],
             [0, 0, 0, 1, 0, 0, 0],
             [0, 0, 0, -1, 0, 0, 0],
             [0, 0, 1, 1, -1, 0, -1],
             [0, 0, -1, 1, 1, 1, 1],
             [-1, 0, -1, 1, -1, -1, -1]], dtype=np.int8)
        vert_p0 = np.array(
            [[0., 0., 0., 0., 0., 0., 0.],
             [0., 0., 0., -1., 0., 0., 0.],
             [1., 0., 1., -1., 0., 0., 0.],
             [-1., -1., 1., 1., 0., 0., 0.],
             [1., 1., 1., -1., 0., 0., 0.],
             [1., -1., 1., -1., 0., -1., 0.]], dtype=np.int8)

        cases = [
            (zeros, [0, 0, 0]),
            (diag_p0, [1, 0, 0]),
            (diag2_p0, [1, 0, 0]),
            (diag_p1, [0, 1, 0]),
            (ongoing, [0, 0, 0]),
            (col_p0, [1, 0, 0]),  # bottom 4-in-row of col 3 region (wins)
            (vert_p0, [1, 0, 0]),  # column 2 vertical win
        ]
        for arr, expected in cases:
            s = board_from_array(arr)
            got = np.asarray(Connect4.win_state(s))
            np.testing.assert_array_equal(got, np.array(expected, np.float32)), arr

    def test_draw(self):
        # Full board without a win: columns filled in a pattern avoiding 4s.
        moves = []
        for group in ([0, 1, 2], [3, 4, 5, 6], [0, 1, 2], [3, 4, 5, 6]):
            for col in group:
                moves.append(col)
        # Build full board via alternating fill avoiding wins:
        pattern = np.array(
            [[1, -1, 1, -1, 1, -1, 1],
             [1, -1, 1, -1, 1, -1, 1],
             [-1, 1, -1, 1, -1, 1, -1],
             [1, -1, 1, -1, 1, -1, 1],
             [1, -1, 1, -1, 1, -1, 1],
             [-1, 1, -1, 1, -1, 1, -1]], dtype=np.int8)
        s = board_from_array(pattern)
        got = np.asarray(Connect4.win_state(s))
        np.testing.assert_array_equal(got, np.array([0, 0, 1], np.float32))

    def test_symmetries(self):
        s = play_moves(Connect4, [0, 0, 1, 0, 6])
        obs = Connect4.observation(s)
        pi = jnp.arange(7, dtype=jnp.float32)
        obs_k, pi_k = Connect4.symmetries(obs, pi)
        assert obs_k.shape == (2, 4, 6, 7)
        np.testing.assert_array_equal(np.asarray(obs_k[0]), np.asarray(obs))
        np.testing.assert_array_equal(
            np.asarray(obs_k[1]), np.asarray(obs)[:, :, ::-1]
        )
        np.testing.assert_array_equal(np.asarray(pi_k[1]), np.arange(7)[::-1])

    def test_immutability(self):
        s = play_moves(Connect4, [1, 2, 3, 3, 4])
        before = np.asarray(s.board).copy()
        s2 = Connect4.step(s, 3)
        np.testing.assert_array_equal(np.asarray(s.board), before)
        assert not np.array_equal(np.asarray(s2.board), before)

    def test_observation_planes(self):
        s = play_moves(Connect4, [3, 4])
        obs = np.asarray(Connect4.observation(s))
        assert obs.shape == (4, 6, 7)
        assert obs[0, 5, 3] == 1.0  # player 0 stone
        assert obs[1, 5, 4] == 1.0  # player 1 stone
        assert np.all(obs[2] == 0.0)  # player 0 to move
        assert np.allclose(obs[3], 2 / 42)

    def test_vmap_lockstep(self):
        """The whole point: thousands of boards step in lockstep under jit."""
        B = 32
        states = jax.vmap(lambda _: Connect4.init())(jnp.arange(B))
        actions = jnp.arange(B) % 7
        step = jax.jit(jax.vmap(Connect4.step))
        states = step(states, actions)
        assert states.board.shape == (B, 6, 7)
        valids = jax.jit(jax.vmap(Connect4.valid_moves))(states)
        assert valids.shape == (B, 7)
        ws = jax.jit(jax.vmap(Connect4.win_state))(states)
        assert ws.shape == (B, 3)
        assert not np.any(np.asarray(ws))


class TestTicTacToe:
    def test_row_win(self):
        s = play_moves(TicTacToe, [0, 3, 1, 4, 2])  # p0 takes the top row
        np.testing.assert_array_equal(
            np.asarray(TicTacToe.win_state(s)), [1, 0, 0]
        )

    def test_draw(self):
        s = play_moves(TicTacToe, [0, 1, 2, 4, 3, 5, 7, 6, 8])
        np.testing.assert_array_equal(
            np.asarray(TicTacToe.win_state(s)), [0, 0, 1]
        )

    def test_diag_win_p1(self):
        s = play_moves(TicTacToe, [1, 0, 2, 4, 5, 8])  # p1 takes main diagonal
        np.testing.assert_array_equal(
            np.asarray(TicTacToe.win_state(s)), [0, 1, 0]
        )

    def test_symmetries(self):
        s = play_moves(TicTacToe, [0, 1])
        obs = TicTacToe.observation(s)
        pi = jnp.arange(9, dtype=jnp.float32)
        obs_k, pi_k = TicTacToe.symmetries(obs, pi)
        assert obs_k.shape == (8, 1, 3, 3)
        assert pi_k.shape == (8, 9)
        # All 8 dihedral transforms are distinct for an asymmetric position.
        flat = {bytes(np.asarray(o).tobytes()) for o in obs_k}
        assert len(flat) == 8
