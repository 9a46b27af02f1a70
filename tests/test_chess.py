"""Chess rules kernel tests.

Legal move generation is validated by perft — node counts from the six
standard test positions (chessprogramming.org perft results) which together
exercise castling, en passant (including the pinned/discovered-check cases),
promotions, underpromotion captures, pins and double checks. The reference
has no chess tests to port (its env is a stub, reference:
alphazero/envs/chess/chess.py:82-92).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.envs.chess import (
    Chess, action_to_uci, from_fen, to_fen, uci_to_action,
)

CHUNK = 2048  # fixed vmap width -> exactly one compile of each kernel

_vm = jax.jit(jax.vmap(Chess.valid_moves))
_step = jax.jit(jax.vmap(Chess.step))


def _chunked_valids(batch, n_real):
    """valid_moves over the first n_real rows of a stacked state pytree."""
    out = []
    pad_row = jax.tree_util.tree_map(lambda x: x[:1], batch)
    for s in range(0, n_real, CHUNK):
        e = min(s + CHUNK, n_real)
        chunk = jax.tree_util.tree_map(lambda x: x[s:e], batch)
        if e - s < CHUNK:
            pad = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (CHUNK - (e - s),) + x.shape[1:]),
                pad_row)
            chunk = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), chunk, pad)
        out.append(np.asarray(_vm(chunk))[: e - s])
    return np.concatenate(out)


def _chunked_step(batch, idx, act):
    outs = []
    for s in range(0, len(idx), CHUNK):
        e = min(s + CHUNK, len(idx))
        ip = np.concatenate([idx[s:e], np.zeros(CHUNK - (e - s), np.int64)])
        ap = np.concatenate([act[s:e], np.zeros(CHUNK - (e - s), np.int64)])
        gathered = jax.tree_util.tree_map(
            lambda x: x[jnp.asarray(ip)], batch)
        stepped = _step(gathered, jnp.asarray(ap, jnp.int32))
        outs.append(jax.tree_util.tree_map(lambda x: x[: e - s], stepped))
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *outs)


def perft(state, depth):
    batch = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
    n = 1
    for d in range(depth):
        v = _chunked_valids(batch, n)
        if d == depth - 1:
            return int(v.sum())
        idx, act = np.nonzero(v)
        batch = _chunked_step(batch, idx, act)
        n = len(idx)
    return n


PERFT_CASES = [
    # (name, fen or None for startpos, [perft(1), perft(2), ...])
    ("startpos", None, [20, 400, 8902, 197281]),
    ("kiwipete",
     "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1",
     [48, 2039, 97862]),
    ("pos3", "8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1",
     [14, 191, 2812, 43238]),
    ("pos4",
     "r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1",
     [6, 264, 9467]),
    ("pos5", "rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8",
     [44, 1486, 62379]),
    ("pos6",
     "r4rk1/1pp1qppp/p1np1n2/2b1p1B1/2B1P1b1/P1NP1N2/1PP1QPPP/R4RK1 w - - 0 10",
     [46, 2079, 89890]),
]


@pytest.mark.parametrize("name,fen,expected",
                         PERFT_CASES, ids=[c[0] for c in PERFT_CASES])
def test_perft(name, fen, expected):
    state = Chess.init() if fen is None else from_fen(fen)
    for depth, want in enumerate(expected, start=1):
        assert perft(state, depth) == want, f"{name} perft({depth})"


def _play(state, *ucis):
    for u in ucis:
        a = uci_to_action(state, u)
        assert bool(Chess.valid_moves(state)[a]), f"{u} not legal"
        state = Chess.step(state, a)
    return state


def test_fen_round_trip_and_ruy_lopez():
    s = Chess.init()
    assert to_fen(s) == (
        "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1")
    s = _play(s, "e2e4", "e7e5", "g1f3", "b8c6", "f1b5")
    assert to_fen(s) == (
        "r1bqkbnr/pppp1ppp/2n5/1B2p3/4P3/5N2/PPPP1PPP/RNBQK2R b KQkq - 3 3")


def test_en_passant_square_set_and_capture():
    s = _play(Chess.init(), "e2e4", "a7a6", "e4e5", "d7d5")
    assert to_fen(s).split()[3] == "d6"
    a = uci_to_action(s, "e5d6")
    assert bool(Chess.valid_moves(s)[a])
    s2 = Chess.step(s, a)
    b = np.asarray(s2.board)
    assert b[5, 3] == 1 and b[4, 3] == 0  # pawn on d6, d5 emptied


def test_en_passant_discovered_check_is_illegal():
    # After exd3 both pawns leave rank 4 and the h4 rook would hit the a4
    # king — the ep capture must be rejected, the plain push must stay legal.
    s = from_fen("8/8/8/8/k2Pp2R/8/8/4K3 b - d3 0 1")
    v = Chess.valid_moves(s)
    assert not bool(v[uci_to_action(s, "e4d3")])
    assert bool(v[uci_to_action(s, "e4e3")])


def test_castling_moves_rook_and_clears_rights():
    s = _play(Chess.init(), "e2e4", "e7e5", "g1f3", "b8c6", "f1c4", "g8f6",
              "e1g1")
    b = np.asarray(s.board)
    assert b[0, 6] == 6 and b[0, 5] == 4 and b[0, 4] == 0 and b[0, 7] == 0
    assert not bool(s.castling[0]) and not bool(s.castling[1])
    assert bool(s.castling[2]) and bool(s.castling[3])


def test_rook_capture_clears_opponent_right():
    s = from_fen("r3k2r/8/8/8/8/8/8/R3K2R w KQkq - 0 1")
    s = _play(s, "a1a8")
    assert not bool(s.castling[3])  # black queenside right gone
    assert bool(s.castling[2])


def test_promotion_queen_and_underpromotion():
    s = from_fen("8/P6k/8/8/8/8/6K1/8 w - - 0 1")
    q = Chess.step(s, uci_to_action(s, "a7a8q"))
    assert np.asarray(q.board)[7, 0] == 5
    n = Chess.step(s, uci_to_action(s, "a7a8n"))
    assert np.asarray(n.board)[7, 0] == 2


def test_fools_mate_and_win_state():
    s = _play(Chess.init(), "f2f3", "e7e5", "g2g4", "d8h4")
    w = np.asarray(Chess.win_state(s))
    assert w.tolist() == [0.0, 1.0, 0.0]  # black (player 1) wins


def test_stalemate_is_draw():
    s = from_fen("7k/5Q2/6K1/8/8/8/8/8 b - - 0 1")
    w = np.asarray(Chess.win_state(s))
    assert w.tolist() == [0.0, 0.0, 1.0]


def test_fifty_move_and_insufficient_material_draws():
    s = from_fen("4k3/8/8/8/8/8/8/4K2R w - - 100 80")
    assert np.asarray(Chess.win_state(s)).tolist() == [0.0, 0.0, 1.0]
    s = from_fen("4k3/8/8/8/8/8/8/4KN2 w - - 0 1")
    assert np.asarray(Chess.win_state(s)).tolist() == [0.0, 0.0, 1.0]
    s = from_fen("4k3/8/8/8/8/8/8/4K2R w - - 0 1")  # rook: not insufficient
    assert np.asarray(Chess.win_state(s)).tolist() == [0.0, 0.0, 0.0]


def test_uci_round_trip_all_legal_moves():
    for fen in (None, PERFT_CASES[1][1], PERFT_CASES[4][1]):
        s = Chess.init() if fen is None else from_fen(fen)
        v = np.asarray(Chess.valid_moves(s))
        for a in np.nonzero(v)[0]:
            assert uci_to_action(s, action_to_uci(s, int(a))) == int(a)


@pytest.mark.slow
def test_selfplay_warmup_chunk():
    """The full jitted self-play pipeline runs with the 4672-action space."""
    import alphazero_general_tpu.mcts.tree as T
    from alphazero_general_tpu.selfplay import (
        SelfPlayConfig, init_selfplay, play_chunk,
    )

    spec = T.SearchSpec(add_root_noise=True, add_root_temp=True,
                        num_players=2, has_draw=True)
    cfg = SelfPlayConfig(sims_full=8, sims_fast=4, sims_warmup=4,
                         prob_fast=0.5, spec=spec)
    carry = init_selfplay(Chess, 4, cfg.start_temp)
    carry, rec = jax.jit(
        lambda c, r: play_chunk(Chess, cfg, None, c, r, 6, warmup=True)
    )(carry, jax.random.PRNGKey(0))
    assert rec.obs.shape == (6, 4, 20, 8, 8)
    assert rec.pi.shape == (6, 4, 4672)
    assert bool(jnp.all(rec.pi.sum(-1) > 0.99))


def test_registry_and_contract():
    env = get_env("chess")
    assert env is Chess
    s = env.init()
    obs = env.observation(s)
    assert obs.shape == env.OBS_SHAPE
    assert env.valid_moves(s).shape == (env.ACTION_SIZE,)
    assert float(env.crude_value(s)) == 0.5
    assert "White to move" in env.display(s)


def test_threefold_repetition_draw():
    # Shuffle knights back and forth: the third occurrence of the start
    # position (same side to move, rights unchanged) is a draw.
    s = Chess.init()
    moves = ["g1f3", "g8f6", "f3g1", "f6g8"]
    for cycle in range(2):
        for u in moves:
            assert np.asarray(Chess.win_state(s)).sum() == 0, (cycle, u)
            s = _play(s, u)
    # Position now equals the start position for the third time.
    assert np.asarray(Chess.win_state(s)).tolist() == [0.0, 0.0, 1.0]


def test_repetition_ring_resets_on_pawn_move():
    s = Chess.init()
    for u in ["g1f3", "g8f6", "f3g1", "f6g8",
              "e2e4", "e7e5",  # irreversible: resets the ring
              "g1f3", "g8f6", "f3g1", "f6g8"]:
        s = _play(s, u)
    # Only the second occurrence of the post-e4/e5 position: no draw.
    assert np.asarray(Chess.win_state(s)).sum() == 0
