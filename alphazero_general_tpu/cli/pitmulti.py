"""Benchmark every k-th checkpoint of a run against a fixed opponent:
``python -m alphazero_general_tpu.cli.pitmulti <env> --run <run_name>``.

Parity with the reference's pit-multi tool (reference:
alphazero/pit-multi.py:22-104 — stale there, live here): each selected
checkpoint plays ``--games`` batched arena games against either the RawMCTS
baseline or a fixed checkpoint; winrates are written to the metrics stream
(tag ``win_rate/pit_multi``) and printed.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_env_arg(p)
    p.add_argument("--run", required=True, help="run name under --checkpoint")
    p.add_argument("--checkpoint", default="checkpoint")
    p.add_argument("--every", type=int, default=5,
                   help="test every k-th checkpoint")
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--vs", default="baseline",
                   help="'baseline' (RawMCTS) or a fixed checkpoint path")
    add_device_arg(p, default="auto")
    add_args_overrides(p)
    ns = p.parse_args(argv)

    apply_device(ns)
    enable_compile_cache()
    env = resolve_env(ns)
    args = resolve_args(ns)

    import jax

    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.selfplay.arena import (
        ArenaConfig, make_arena_fn, raw_mcts_apply, winrates,
    )
    from alphazero_general_tpu.utils.metrics import make_writer

    folder = os.path.join(ns.checkpoint, ns.run)
    ckpts = sorted(glob(os.path.join(folder, "iteration-*.ckpt")))
    selected = ckpts[:: max(ns.every, 1)]
    if ckpts and ckpts[-1] not in selected:
        selected.append(ckpts[-1])
    if not selected:
        raise SystemExit(f"no checkpoints under {folder}")

    cfg = ArenaConfig.from_args(args, env.NUM_PLAYERS, env.HAS_DRAW)
    writer = make_writer("runs", ns.run + "-pitmulti")

    # Fixed opponent.
    first = NNetWrapper.from_checkpoint(
        env, *os.path.split(selected[0][: -len(".ckpt")]))
    model = first.model

    def apply_fn(variables, obs):
        return model.apply(variables, obs, train=False)

    if ns.vs == "baseline":
        apply_b = raw_mcts_apply(env.ACTION_SIZE,
                                 env.NUM_PLAYERS + int(env.HAS_DRAW))
        opp_vars = {}
        opp_name = "RawMCTS baseline"
    else:
        opp = NNetWrapper.from_checkpoint(
            env, *os.path.split(ns.vs.removesuffix(".ckpt")))
        apply_b = apply_fn
        opp_vars = opp.state.variables
        opp_name = ns.vs

    arena = make_arena_fn(env, cfg, apply_fn, ns.games, apply_fn_b=apply_b)
    rng = jax.random.PRNGKey(0)
    print(f"pitting {len(selected)} checkpoints vs {opp_name}")
    for path in selected:
        name = os.path.basename(path).removesuffix(".ckpt")
        it = int(name.split("-")[-1])
        nn = NNetWrapper.from_checkpoint(env, folder, name)
        rng, sub = jax.random.split(rng)
        res = arena(nn.state.variables, opp_vars, sub)
        wr = float(np.asarray(winrates(res))[0])
        writer.add_scalar("win_rate/pit_multi", wr, it)
        wins = np.asarray(res.model_wins)
        print(f"{name}: winrate {wr:.3f} "
              f"({wins[0]:.0f}-{wins[1]:.0f}, {float(res.draws):.0f} draws)")
    writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
