"""Evaluator service + web GUI server tests."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.players.evaluator import MCTSEvaluator, greedy_value
from alphazero_general_tpu.utils.config import get_args

# Integration tier: full Coach cycles / sweeps — deselect with -m 'not slow' for the quick tier.
pytestmark = pytest.mark.slow


def c4(moves):
    s = Connect4.init()
    for m in moves:
        s = Connect4.step(s, m)
    return s


class TestEvaluator:
    def test_blocking_analysis_finds_win(self):
        ev = MCTSEvaluator(Connect4, get_args(), max_search_time=20.0,
                           max_sims=240, sims_per_tick=40)
        s = c4([2, 0, 3, 0, 4, 1])  # p0 wins at 1 or 5
        a = ev.analyze_blocking(s)
        assert a.sims >= 240
        assert a.best_actions[0] in (1, 5), a.best_actions
        assert a.value > 0.8
        assert not a.running

    def test_background_analysis_publishes_incrementally(self):
        ev = MCTSEvaluator(Connect4, get_args(), max_search_time=30.0,
                           max_sims=2000, sims_per_tick=20)
        ev.start(c4([3]))
        deadline = time.time() + 25
        seen = 0
        while time.time() < deadline:
            a = ev.analysis
            if a.sims > seen:
                seen = a.sims
            if seen >= 40:
                break
            time.sleep(0.2)
        ev.stop()
        assert seen >= 40, "no incremental updates observed"
        a = ev.analysis
        assert 0.0 <= a.value <= 1.0

    def test_terminal_position_no_crash(self):
        ev = MCTSEvaluator(Connect4, get_args(), max_sims=40)
        s = c4([2, 0, 3, 0, 4, 0, 5])  # p0 has won
        a = ev.analyze_blocking(s)
        assert not a.running

    def test_greedy_value(self):
        assert greedy_value(Connect4, Connect4.init()) == 0.5


@pytest.fixture(scope="module")
def gui_server():
    from http.server import ThreadingHTTPServer

    from alphazero_general_tpu.gui.server import Handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def api(base, path, body=None):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method="POST" if body is not None else "GET",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read()), r.status
    except urllib.error.HTTPError as e:
        return json.loads(e.read()), e.code


class TestGuiServer:
    def test_index_serves_html(self, gui_server):
        with urllib.request.urlopen(gui_server + "/") as r:
            body = r.read().decode()
        assert "alphazero_general_tpu" in body and "<table" in body

    def test_envs_listed(self, gui_server):
        out, status = api(gui_server, "/api/envs")
        assert status == 200
        assert "connect4" in out["envs"]

    def test_full_game_flow(self, gui_server):
        out, status = api(gui_server, "/api/new", {
            "env": "tictactoe", "opponent": "rawmcts", "human_seat": 0,
        })
        assert status == 200, out
        game = out["game"]
        assert len(out["board"]) == 3
        assert not out["terminal"]

        # Play center as human; agent replies.
        out, status = api(gui_server, "/api/move",
                          {"game": game, "to": [1, 1]})
        assert status == 200, out
        board = out["board"]
        filled = sum(1 for row in board for c in row if c)
        assert filled == 2  # human + agent move applied
        assert out["player"] == 0  # back to the human

        # Illegal move: same cell again.
        out, _ = api(gui_server, "/api/move", {"game": game, "to": [1, 1]})
        assert out["message"] == "illegal move"

        # Undo returns to a human-to-move state with fewer stones.
        out, _ = api(gui_server, "/api/undo", {"game": game})
        board = out["board"]
        assert sum(1 for row in board for c in row if c) == 0

    def test_unknown_game_404(self, gui_server):
        out, status = api(gui_server, "/api/move",
                          {"game": "nope", "to": [0, 0]})
        assert status == 404


class TestTrainPanel:
    def test_train_via_api(self, gui_server, tmp_path, monkeypatch):
        import os

        monkeypatch.chdir(tmp_path)  # keep checkpoint/data/runs out of repo
        out, status = api(gui_server, "/api/train/start", {
            "env": "tictactoe",
            "overrides": {
                "numIters": 1, "gamesPerIteration": 4,
                "process_batch_size": 4, "numMCTSSims": 3, "numFastSims": 2,
                "numWarmupSims": 2, "arenaCompare": 4,
                "arenaCompareBaseline": 4, "num_channels": 4, "depth": 1,
                "value_dense_layers": [8], "policy_dense_layers": [8],
                "value_head_channels": 2, "policy_head_channels": 2,
                "compute_dtype": "float32", "train_batch_size": 8,
                "run_name": "webtrain",
            },
        })
        assert status == 200 and out.get("ok"), out

        # Second start while running must be refused (or the first already
        # finished — then it errors differently or succeeds; only assert the
        # busy case when still running).
        st, _ = api(gui_server, "/api/train/status")
        if st["running"]:
            out2, _ = api(gui_server, "/api/train/start", {"env": "tictactoe"})
            assert "error" in out2

        deadline = time.time() + 120
        final = None
        while time.time() < deadline:
            st, _ = api(gui_server, "/api/train/status")
            final = st
            if not st["running"]:
                break
            time.sleep(1)
        assert final is not None and not final["running"], final
        assert final["error"] is None, final
        assert final["model_iter"] >= 2  # finished iteration 1
        assert os.path.exists("checkpoint/webtrain/iteration-0001.ckpt")

    def test_pause_and_stop_endpoints(self, gui_server):
        # With no session or a finished one these still respond sanely.
        out, _ = api(gui_server, "/api/train/pause", {})
        assert "paused" in out or "error" in out
        out, _ = api(gui_server, "/api/train/stop", {})
        assert "ok" in out or "error" in out


class TestChessStrategoWeb:
    """Chess and stratego (placement phase) through the web API."""

    def test_chess_flow(self, gui_server):
        out, status = api(gui_server, "/api/new", {
            "env": "chess", "opponent": "rawmcts", "human_seat": 0,
            "sims": 4,
        })
        assert status == 200, out
        game = out["game"]
        assert out["needs_two_clicks"]
        # Display is flipped: rank 8 on top; white pawns on display row 6.
        assert out["board"][6][4] == "♙"  # white pawn on e2
        assert out["board"][0][4] == "♚"  # black king on e8
        # Human: e2e4 (display rows: e2 -> 6, e4 -> 4).
        out, status = api(gui_server, "/api/move",
                          {"game": game, "from": [6, 4], "to": [4, 4]})
        assert status == 200, out
        assert out["board"][4][4] == "♙"  # pawn arrived on e4
        assert out["turns"] == 2  # agent replied
        assert out["player"] == 0

    def test_stratego_placement_flow(self, gui_server):
        out, status = api(gui_server, "/api/new", {
            "env": "stratego", "opponent": "rawmcts", "human_seat": 0,
            "sims": 4,
        })
        assert status == 200, out
        game = out["game"]
        counts = dict((k, v) for k, v in out["place_counts"])
        assert counts["F"] == 1 and counts["B"] == 5
        # Place the flag at red's back rank.
        out, status = api(gui_server, "/api/move",
                          {"game": game, "to": [0, 0], "piece": "F"})
        assert status == 200, out
        assert out["board"][0][0] == "F"
        counts = dict((k, v) for k, v in out["place_counts"])
        assert counts["F"] == 0
        assert out["turns"] == 2  # agent placed too
        # Enemy placement must be censored ("?" with underline marker).
        blues = [c for row in out["board"] for c in row
                 if c and c[0] == "?"]
        assert len(blues) == 1


class TestGuiFidelity:
    """Round-2 GUI additions: args editor endpoint, human-vs-human play
    (hotseat + networked join), last-move/worst-move hints in the view."""

    def test_args_endpoint(self, gui_server):
        out, status = api(gui_server, "/api/args?env=connect4")
        assert status == 200
        assert out["args"]["numMCTSSims"] > 0
        assert all(not k.startswith("_") for k in out["args"])
        # callables encode as "__CALLABLE__<name>" strings, never eval'd
        assert str(out["args"]["temp_scaling_fn"]).startswith("__CALLABLE__")

    def test_hotseat_two_humans(self, gui_server):
        out, _ = api(gui_server, "/api/new",
                     {"env": "tictactoe", "opponent": "hotseat",
                      "human_seat": 0})
        game = out["game"]
        assert out["mode"] == "hotseat"
        # Both seats move from the same client; players alternate.
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [0, 0]})
        assert out["player"] == 1 and out["turns"] == 1
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [1, 1]})
        assert out["player"] == 0 and out["turns"] == 2
        assert out["last_move"] == [1, 1]

    def test_networked_join_and_turn_tokens(self, gui_server):
        out, _ = api(gui_server, "/api/new",
                     {"env": "tictactoe", "opponent": "human",
                      "human_seat": 0})
        game, tok0 = out["game"], out["token"]
        # Moving before anyone joins is rejected.
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [0, 0], "token": tok0})
        assert out["turns"] == 0
        out, _ = api(gui_server, "/api/join", {"game": game})
        tok1 = out["token"]
        assert out["seat"] == 1
        # Seat 1 cannot move first; seat 0 can; then seat 1.
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [0, 0], "token": tok1})
        assert out["turns"] == 0 and "not your turn" in out["message"]
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [0, 0], "token": tok0})
        assert out["turns"] == 1
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [1, 1], "token": tok1})
        assert out["turns"] == 2
        # Bogus token rejected.
        out, _ = api(gui_server, "/api/move",
                     {"game": game, "to": [2, 2], "token": "nope"})
        assert out["turns"] == 2


class TestTensorBoardLauncher:
    def test_status_then_start_stop(self, gui_server, tmp_path):
        out, status = api(gui_server, "/api/tensorboard")
        assert status == 200 and out["running"] is False

        # Start against an empty logdir (reference parity:
        # AlphaZeroGUI/main.py:977-982). If tensorboard is importable the
        # server must report running + a URL; either way the endpoint
        # responds with a well-formed status.
        out, status = api(gui_server, "/api/tensorboard/start",
                          {"logdir": str(tmp_path), "port": 16007})
        assert status == 200
        if out.get("running"):
            assert out["url"].startswith("http://127.0.0.1:16007")
            assert out["logdir"] == str(tmp_path)
            st, _ = api(gui_server, "/api/tensorboard")
            assert st["running"] is True
        else:
            assert "error" in out
        out, status = api(gui_server, "/api/tensorboard/stop", {})
        assert status == 200 and out["running"] is False


class TestPageContract:
    """Page-level smoke for the canvas UI. A true headless-browser drive is
    environment-blocked here (no chrome/node/selenium in the image), so this
    pins the served page's contract instead: the canvas renderer, eval bar,
    move-arrow drawing, and every JS api() call target must exist and match
    the endpoints the API-level tests above exercise."""

    def test_page_serves_canvas_ui(self, gui_server):
        import urllib.request

        with urllib.request.urlopen(f"{gui_server}/") as r:
            page = r.read().decode()
        assert 'canvas id="board"' in page
        assert 'id="evalbar"' in page and 'id="evallabel"' in page
        # Arrow overlays (reference: envs/brandubh/gui.py:42-87).
        assert "hint_moves" in page and "bad_moves" in page
        # Every endpoint the page calls exists in the handler.
        import re

        from alphazero_general_tpu.gui import server as srv

        called = set(re.findall(r"api\('(/api/[\w/]+)'", page))
        assert called, "page should call the JSON API"
        import inspect

        handler_src = inspect.getsource(srv.Handler)
        for ep in called:
            assert ep in handler_src, f"page calls unknown endpoint {ep}"
