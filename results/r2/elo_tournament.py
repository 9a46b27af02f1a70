"""Elo-vs-iterations tournament driver (BASELINE.json north-star metric;
VERDICT.md round-1 item 2).

Pools checkpoints from one or more training runs into a single all-pairs
round-robin (one jitted arena program for every pairing) with the RawMCTS
baseline as anchor, fits I-LSR ratings (utils/elo.py — the reference uses
choix.ilsr_pairwise_dense, roundrobin.py:79-87), anchors Elo so the baseline
is 0, and writes a JSON curve per run.

Usage:
  python results/r2/elo_tournament.py --runs c4_elo_base [c4_elo_reuse ...] \
      --iters 2,4,...  --games 64 --out results/r2/elo_base.json
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

from alphazero_general_tpu.cli.roundrobin import run_tournament  # noqa: E402
from alphazero_general_tpu.envs import get_env  # noqa: E402
from alphazero_general_tpu.models import NNetWrapper  # noqa: E402
from alphazero_general_tpu.selfplay.arena import (  # noqa: E402
    ArenaConfig,
    raw_mcts_apply,
)
from alphazero_general_tpu.utils.config import get_args  # noqa: E402
from alphazero_general_tpu.utils.elo import ilsr_pairwise_dense, to_elo  # noqa: E402
from alphazero_general_tpu.utils.misc import get_iter_file  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", nargs="+", required=True)
    p.add_argument("--iters", required=True,
                   help="comma-separated iteration numbers")
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--sims", type=int, default=100)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args()

    env = get_env("connect4")
    iters = [int(x) for x in ns.iters.split(",")]
    names, variables_list = [], []
    apply_fn = None
    for run in ns.runs:
        for it in iters:
            folder = f"checkpoint/{run}"
            nn = NNetWrapper.from_checkpoint(env, folder, get_iter_file(it))
            names.append(f"{run}@{it:02d}")
            variables_list.append(nn.state.variables)
            if apply_fn is None:
                model = nn.model

                def apply_fn(variables, obs, _m=model):
                    return _m.apply(variables, obs, train=False)

    args = get_args(numMCTSSims=ns.sims, arenaTemp=0.25, cpuct=4.0,
                    fpu_reduction=0.4)
    cfg = ArenaConfig.from_args(args, env.NUM_PLAYERS, env.HAS_DRAW)
    baseline_apply = raw_mcts_apply(
        env.ACTION_SIZE, env.NUM_PLAYERS + int(env.HAS_DRAW))

    t0 = time.time()
    all_names, wins = run_tournament(
        env, cfg, apply_fn, variables_list, names, ns.games,
        jax.random.PRNGKey(ns.seed), baseline_apply=baseline_apply,
    )
    elapsed = time.time() - t0
    ratings = to_elo(ilsr_pairwise_dense(wins))
    ratings = ratings - ratings[all_names.index("baseline")]  # anchor

    result = {
        "runs": ns.runs, "iters": iters, "games_per_pair": ns.games,
        "sims": ns.sims, "tournament_s": round(elapsed, 1),
        "ratings": {n: round(float(r), 1)
                    for n, r in zip(all_names, ratings)},
        "win_matrix": wins.tolist(), "names": all_names,
    }
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=1)
    order = np.argsort(-ratings)
    for rank, idx in enumerate(order, 1):
        print(f"{rank:2d}. {all_names[idx]:<24s} {ratings[idx]:7.1f}")
    print(f"tournament done in {elapsed:.0f}s -> {ns.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
