"""Pit two players: ``python -m alphazero_general_tpu.cli.pit <env> --p1 ... --p2 ...``.

Replaces the reference's hand-edited pit scripts (reference:
alphazero/pit.py:14-45, envs/*/pit.py). Player specs:

  ``mcts:<ckpt-path>``    MCTS + network checkpoint (MCTSPlayer)
  ``nn:<ckpt-path>``      raw network policy (NNPlayer)
  ``rawmcts``             model-free MCTS baseline (JAX)
  ``nativemcts``          model-free MCTS on the C++ host runtime (fastest)
  ``random``              uniform random
  ``greedy``              one-ply crude_value lookahead
  ``human``               console input
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from alphazero_general_tpu.cli.common import (
    add_args_overrides,
    add_device_arg,
    add_env_arg,
    apply_device,
    enable_compile_cache,
    resolve_args,
    resolve_env,
)


def build_player(spec: str, env, args, seed: int):
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.players.players import (
        GreedyValuePlayer,
        HumanConsolePlayer,
        MCTSPlayer,
        NNPlayer,
        RandomPlayer,
        RawMCTSPlayer,
    )

    kind, _, path = spec.partition(":")
    if kind in ("mcts", "nn"):
        if not path:
            raise SystemExit(f"{kind}: needs a checkpoint path, e.g. "
                             f"{kind}:checkpoint/run/iteration-0010")
        folder, filename = os.path.split(path)
        filename = filename.removesuffix(".ckpt")
        nn = NNetWrapper.from_checkpoint(env, folder, filename)
        cls = MCTSPlayer if kind == "mcts" else NNPlayer
        return cls(nn, env, args, seed=seed, verbose=True)
    if kind == "rawmcts":
        return RawMCTSPlayer(env, args, seed=seed)
    if kind == "nativemcts":
        from alphazero_general_tpu.players.players import NativeRawMCTSPlayer

        return NativeRawMCTSPlayer(env, args, seed=seed)
    if kind == "random":
        return RandomPlayer(env, args, seed=seed)
    if kind == "greedy":
        return GreedyValuePlayer(env, args)
    if kind == "human":
        return HumanConsolePlayer(env, args)
    raise SystemExit(f"unknown player spec {spec!r}")


def play_game(env, players, verbose: bool, max_turns: int):
    """Sequential game loop (reference: Arena.pyx:138-186)."""
    state = env.init()
    for p in players:
        p.reset()
    while True:
        win = np.asarray(env.win_state(state))
        if win.any() or int(state.turns) >= max_turns:
            return win, int(state.turns)
        mover = players[int(state.player)]
        action = mover.play(state)
        for p in players:
            p.update(state, action)
        if verbose:
            print(f"turn {int(state.turns)}, player {int(state.player)} "
                  f"-> action {action}")
        state = env.step(state, action)
        if verbose:
            print(env.display(state))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    add_env_arg(p)
    p.add_argument("--p1", required=True, help="player 1 spec")
    p.add_argument("--p2", required=True, help="player 2 spec")
    p.add_argument("--games", type=int, default=2)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    add_device_arg(p, default="cpu")
    add_args_overrides(p)
    ns = p.parse_args(argv)

    apply_device(ns)
    enable_compile_cache()
    env = resolve_env(ns)
    args = resolve_args(ns)

    p1 = build_player(ns.p1, env, args, ns.seed)
    p2 = build_player(ns.p2, env, args, ns.seed + 1)

    wins = [0, 0]
    draws = 0
    for g in range(ns.games):
        # Alternate seats each game (Arena.pyx:332-337).
        seat_players = [p1, p2] if g % 2 == 0 else [p2, p1]
        win, turns = play_game(env, seat_players, ns.verbose, env.MAX_TURNS)
        if win[-1] or not win.any():
            draws += 1
            outcome = "draw"
        else:
            seat_winner = int(np.argmax(win[:-1]))
            model_winner = seat_winner if g % 2 == 0 else 1 - seat_winner
            wins[model_winner] += 1
            outcome = f"p{model_winner + 1} wins"
        print(f"game {g + 1}: {outcome} in {turns} moves "
              f"(p1 {wins[0]} / p2 {wins[1]} / draws {draws})")
    print(f"final: p1 {wins[0]} wins, p2 {wins[1]} wins, {draws} draws")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
