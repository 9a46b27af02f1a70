"""Analyze a position: ``python -m alphazero_general_tpu.cli.analyze <env>``.

The CLI surface of the live evaluator (players/evaluator.py; reference:
Evaluator.py `__main__` console demo, Evaluator.py:413-440). Plays through a
move list, then reports value / best moves / search depth, with or without a
model checkpoint.
"""

from __future__ import annotations

import argparse

import numpy as np

from alphazero_general_tpu.cli.common import (
    add_args_overrides,
    add_device_arg,
    add_env_arg,
    apply_device,
    resolve_args,
    resolve_env,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_env_arg(p)
    p.add_argument("--moves", default="",
                   help="comma-separated action list to reach the position")
    p.add_argument("--ckpt", help="checkpoint path (folder/iteration-NNNN)")
    p.add_argument("--sims", type=int, default=400)
    add_device_arg(p, default="cpu")
    add_args_overrides(p)
    ns = p.parse_args(argv)

    apply_device(ns)
    env = resolve_env(ns)
    args = resolve_args(ns)

    nn = None
    if ns.ckpt:
        import os

        from alphazero_general_tpu.models import NNetWrapper

        folder, filename = os.path.split(ns.ckpt)
        nn = NNetWrapper.from_checkpoint(
            env, folder, filename.removesuffix(".ckpt"))

    state = env.init()
    if ns.moves:
        for m in ns.moves.split(","):
            a = int(m)
            valids = np.asarray(env.valid_moves(state))
            if not valids[a]:
                raise SystemExit(f"move {a} is illegal at turn {state.turns}")
            state = env.step(state, a)

    print(env.display(state))
    print(f"player {int(state.player)} to move, turn {int(state.turns)}")
    win = np.asarray(env.win_state(state))
    if win.any():
        print(f"terminal: win_state={win}")
        return 0

    from alphazero_general_tpu.players.evaluator import MCTSEvaluator

    ev = MCTSEvaluator(env, args, nn=nn, max_search_time=600.0,
                       max_sims=ns.sims, sims_per_tick=min(50, ns.sims))
    a = ev.analyze_blocking(state)
    print(f"value (mover): {a.value:.3f}   depth: {a.depth}   "
          f"sims: {a.sims}   {a.elapsed:.1f}s")
    if a.policy is not None:
        order = np.argsort(-a.policy)[:5]
        for rank, act in enumerate(order, 1):
            if a.policy[act] <= 0:
                break
            print(f"  {rank}. action {int(act)}  visits {a.policy[act]:.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
