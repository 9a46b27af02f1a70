"""All-pairs tournament over checkpoints with Elo-style ratings:
``python -m alphazero_general_tpu.cli.roundrobin <env> --checkpoints a b c``.

Replaces the reference round-robin script + choix ratings (reference:
alphazero/roundrobin.py:14-89) using the jitted batched arena for each pair
and the built-in I-LSR estimator (utils/elo.py).
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


def run_tournament(env, cfg, apply_fn, variables_list, names, games: int,
                   rng, baseline_apply=None, baseline_variables=None,
                   verbose: bool = True):
    """All-pairs tournament (reference: roundrobin.py:44-77) → win matrix.

    One jitted arena program serves every model-vs-model pairing (parameters
    are runtime arguments, so 465 pairings = 1 compile), plus one for
    baseline pairings when ``baseline_apply`` is given (the baseline is
    appended as the last contestant). Returns (names, wins[n, n]) with
    half-credit draws."""
    import jax

    from alphazero_general_tpu.selfplay.arena import make_arena_fn

    names = list(names)
    variables_list = list(variables_list)
    pair_arena = make_arena_fn(env, cfg, apply_fn, games)
    base_arena = None
    if baseline_apply is not None:
        base_arena = make_arena_fn(env, cfg, apply_fn, games,
                                   apply_fn_b=baseline_apply)
        names.append("baseline")
        variables_list.append(baseline_variables or {})

    n = len(names)
    wins = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            rng, sub = jax.random.split(rng)
            if base_arena is not None and j == n - 1:
                res = base_arena(variables_list[i], variables_list[j], sub)
            else:
                res = pair_arena(variables_list[i], variables_list[j], sub)
            mw = np.asarray(res.model_wins)
            d = float(res.draws)
            wins[i, j] += mw[0] + 0.5 * d
            wins[j, i] += mw[1] + 0.5 * d
            if verbose:
                print(f"{names[i]} vs {names[j]}: {mw[0]:.0f}-{mw[1]:.0f} "
                      f"({d:.0f} draws)")
    return names, wins


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_env_arg(p)
    p.add_argument(
        "--checkpoints", nargs="+", required=True,
        help="checkpoint paths (or a glob like 'checkpoint/run/*.ckpt')",
    )
    p.add_argument("--games", type=int, default=32,
                   help="games per pairing (even)")
    p.add_argument("--include-baseline", action="store_true",
                   help="add the model-free RawMCTS baseline as a contestant")
    p.add_argument("--seed", type=int, default=0)
    add_device_arg(p, default="cpu")
    add_args_overrides(p)
    ns = p.parse_args(argv)

    apply_device(ns)
    enable_compile_cache()
    env = resolve_env(ns)
    args = resolve_args(ns)

    import jax

    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.selfplay.arena import (
        ArenaConfig,
        raw_mcts_apply,
    )
    from alphazero_general_tpu.utils.elo import ilsr_pairwise_dense, to_elo

    paths = []
    for c in ns.checkpoints:
        paths.extend(sorted(glob(c)) if any(ch in c for ch in "*?[") else [c])
    names, variables_list = [], []
    base_apply = None
    for path in paths:
        folder, filename = os.path.split(path)
        filename = filename.removesuffix(".ckpt")
        nn = NNetWrapper.from_checkpoint(env, folder, filename)
        names.append(filename)
        variables_list.append(nn.state.variables)
        model = nn.model
        if base_apply is None:
            def base_apply(variables, obs, _m=model):
                return _m.apply(variables, obs, train=False)

    if len(names) + int(ns.include_baseline) < 2:
        raise SystemExit("need at least two contestants")
    cfg = ArenaConfig.from_args(args, env.NUM_PLAYERS, env.HAS_DRAW)
    baseline_apply = None
    if ns.include_baseline:
        baseline_apply = raw_mcts_apply(
            env.ACTION_SIZE, env.NUM_PLAYERS + int(env.HAS_DRAW))
    names, wins = run_tournament(
        env, cfg, base_apply, variables_list, names, ns.games,
        jax.random.PRNGKey(ns.seed), baseline_apply=baseline_apply,
    )

    ratings = to_elo(ilsr_pairwise_dense(wins))
    order = np.argsort(-ratings)
    print("\n=== ratings ===")
    for rank, idx in enumerate(order, 1):
        print(f"{rank:2d}. {names[idx]:<30s} {ratings[idx]:7.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
