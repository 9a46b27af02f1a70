"""Othello and Gobang rule tests (the reference has none for either —
SURVEY.md §4 calls this out as a gap to close)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.envs.gobang import Gobang
from alphazero_general_tpu.envs.othello import Othello


def play(env, moves):
    s = env.init()
    for m in moves:
        s = env.step(s, m)
    return s


class TestOthello:
    def test_initial_position(self):
        s = Othello.init()
        b = np.asarray(s.board)
        assert b[3, 4] == 1 and b[4, 3] == 1
        assert b[3, 3] == -1 and b[4, 4] == -1
        assert np.abs(b).sum() == 4

    def test_initial_valid_moves(self):
        # +1 to move: the four standard openings for the (3,4)/(4,3) player.
        s = Othello.init()
        valids = np.asarray(Othello.valid_moves(s)).reshape(8, 8)
        expected = np.zeros((8, 8), bool)
        # +1 pieces at (3,4),(4,3); -1 at (3,3),(4,4). Legal: jump the -1s.
        expected[2, 2] = expected[3, 2] = False  # sanity placeholder
        legal = {(2, 2), (2, 3), (3, 2), (4, 5), (5, 4), (5, 5)}
        # Compute expected by brute force.
        brute = set()
        b = np.asarray(s.board)
        for r in range(8):
            for c in range(8):
                if b[r, c] != 0:
                    continue
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if dr == dc == 0:
                            continue
                        rr, cc = r + dr, c + dc
                        seen_opp = False
                        while 0 <= rr < 8 and 0 <= cc < 8:
                            if b[rr, cc] == -1:
                                seen_opp = True
                            elif b[rr, cc] == 1:
                                if seen_opp:
                                    brute.add((r, c))
                                break
                            else:
                                break
                            rr += dr
                            cc += dc
        got = {(r, c) for r in range(8) for c in range(8) if valids[r, c]}
        assert got == brute
        del expected, legal

    def test_flips_applied(self):
        s = Othello.init()
        # +1 plays (2,3): flips (3,3).
        s2 = Othello.step(s, 2 * 8 + 3)
        b = np.asarray(s2.board)
        assert b[2, 3] == 1 and b[3, 3] == 1
        assert np.sum(b == 1) == 4 and np.sum(b == -1) == 1

    def test_win_state_by_piece_diff(self):
        # Player to move has no legal moves → game over, count decides.
        s = Othello.init()
        board = np.zeros((8, 8), np.int8)
        board[0, :4] = 1  # only +1 pieces: -1 (to move) has no moves
        s = s.replace(board=jnp.asarray(board), player=jnp.int32(1))
        w = np.asarray(Othello.win_state(s))
        np.testing.assert_array_equal(w, [1, 0, 0])

    def test_not_terminal_with_moves(self):
        s = Othello.init()
        assert not np.asarray(Othello.win_state(s)).any()

    def test_full_random_game_vmapped(self):
        """Random playout under vmap: must terminate within MAX_TURNS and
        produce exactly one outcome."""
        B = 4
        key = jax.random.PRNGKey(0)
        states = jax.vmap(lambda _: Othello.init())(jnp.arange(B))
        step = jax.jit(jax.vmap(Othello.step))
        valid_f = jax.jit(jax.vmap(Othello.valid_moves))
        win_f = jax.jit(jax.vmap(Othello.win_state))
        done = np.zeros(B, bool)
        for t in range(Othello.MAX_TURNS):
            w = np.asarray(win_f(states))
            done |= w.any(-1)
            if done.all():
                break
            valids = np.asarray(valid_f(states))
            key, sub = jax.random.split(key)
            # Pick a random valid move per board (fallback 0 for done).
            probs = valids / np.maximum(valids.sum(-1, keepdims=True), 1)
            probs = np.where(valids.sum(-1, keepdims=True) > 0, probs, 1 / 64)
            acts = np.array([
                np.random.default_rng(int(t * 100 + b)).choice(64, p=probs[b])
                for b in range(B)
            ])
            # Don't step finished boards.
            prev = states
            states = step(states, jnp.asarray(acts))
            states = jax.tree_util.tree_map(
                lambda n, p: jnp.where(
                    jnp.asarray(done).reshape((B,) + (1,) * (n.ndim - 1)), p, n
                ), states, prev)
        assert done.all() or t == Othello.MAX_TURNS - 1


class TestGobang:
    def test_horizontal_win(self):
        moves = []
        for i in range(4):
            moves += [i, 15 * 14 + i]  # p0 row 0, p1 row 14
        moves.append(4)  # p0 completes five
        s = play(Gobang, moves)
        np.testing.assert_array_equal(
            np.asarray(Gobang.win_state(s)), [1, 0, 0]
        )

    def test_diagonal_win_p1(self):
        moves = []
        for i in range(4):
            moves += [15 * 7 + i, i * 15 + i]  # p1 on main diagonal
        moves += [15 * 7 + 10, 4 * 15 + 4]
        s = play(Gobang, moves)
        np.testing.assert_array_equal(
            np.asarray(Gobang.win_state(s)), [0, 1, 0]
        )

    def test_no_win_four(self):
        moves = []
        for i in range(4):
            moves += [i, 15 * 14 + i]
        s = play(Gobang, moves)
        assert not np.asarray(Gobang.win_state(s)).any()

    def test_obs_planes(self):
        s = play(Gobang, [0, 224])
        obs = np.asarray(Gobang.observation(s))
        assert obs.shape == (4, 15, 15)
        assert obs[0, 0, 0] == 1 and obs[1, 14, 14] == 1

    def test_symmetries_count(self):
        s = play(Gobang, [0, 1])
        obs = Gobang.observation(s)
        pi = jnp.arange(225, dtype=jnp.float32)
        obs_k, pi_k = Gobang.symmetries(obs, pi)
        assert obs_k.shape == (8, 4, 15, 15) and pi_k.shape == (8, 225)
