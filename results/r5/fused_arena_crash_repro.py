"""Minimal repro: fused whole-game arena while_loop crashes the TPU worker
at large sims x tower scale (VERDICT r4 weak #5 / next-round item 5).

Observed in round 4: a two-model arena with search fused into
``lax.while_loop`` (selfplay/arena.py fused driver) kills the TPU runtime
worker at hnefatafl scale — 250 sims, 128ch x depth-10 tower — while
(a) the identical per-move program host-stepped (``arenaHostLoop=True``)
runs fine and plays bit-identical games, and (b) every component standalone
(self-play search fused in while_loop at the same scale, the same arena at
smaller sims/towers) is healthy.

This script builds exactly the failing program shape with random weights and
runs ONE fused arena of 8 games. Expected outcome on the affected platform:
the TPU worker dies (tunnel drops / RESOURCE_EXHAUSTED / connection reset)
during execution. The host-stepped control (--hostloop) completes.

Usage::

    python results/r5/fused_arena_crash_repro.py            # fused (crashes)
    python results/r5/fused_arena_crash_repro.py --hostloop # control (ok)
    python results/r5/fused_arena_crash_repro.py --sims 50  # scale probe

Archived outcome from this container: results/r5/fused_arena_crash_repro.md
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from alphazero_general_tpu.envs import get_env  # noqa: E402
from alphazero_general_tpu.models import NNetWrapper  # noqa: E402
from alphazero_general_tpu.selfplay.arena import (  # noqa: E402
    ArenaConfig, make_arena_fn,
)
from alphazero_general_tpu.utils.config import get_args  # noqa: E402

import alphazero_general_tpu.mcts.tree as T  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hostloop", action="store_true",
                    help="host-stepped control driver (expected to work)")
    ap.add_argument("--sims", type=int, default=250)
    ap.add_argument("--games", type=int, default=8)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--depth", type=int, default=10)
    args_ns = ap.parse_args()

    env = get_env("hnefatafl")
    # The r4 flagship tower (results/r4/hnefatafl_r4_config.py).
    args = get_args(
        num_channels=args_ns.channels, depth=args_ns.depth,
        value_head_channels=32, policy_head_channels=32,
        value_dense_layers=[4096, 128], policy_dense_layers=[4096],
    )
    net = NNetWrapper(env, args)

    def apply_fn(variables, obs):
        return net.model.apply(variables, obs, train=False)

    spec = T.SearchSpec(num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW,
                        add_root_noise=False, add_root_temp=False)
    cfg = ArenaConfig(sims=args_ns.sims, spec=spec,
                      host_loop=args_ns.hostloop)
    run = make_arena_fn(env, cfg, apply_fn, args_ns.games)
    driver = "host-stepped" if args_ns.hostloop else "fused while_loop"
    print(f"[repro] {driver}: {args_ns.games} games, {args_ns.sims} sims, "
          f"{args_ns.channels}ch x {args_ns.depth} on "
          f"{jax.devices()[0].platform}", flush=True)
    t0 = time.time()
    res = run(net.state.variables, net.state.variables, jax.random.PRNGKey(0))
    wins = [float(w) for w in res.model_wins]
    print(f"[repro] COMPLETED in {time.time() - t0:.1f}s: wins={wins} "
          f"draws={float(res.draws):.0f} "
          f"avg_len={float(res.avg_game_length):.1f}", flush=True)


if __name__ == "__main__":
    main()
