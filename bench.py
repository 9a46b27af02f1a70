"""Headline benchmark: connect4 self-play MCTS throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline derivation (the reference publishes no formal numbers — BASELINE.md):
README.md:124 reports 35 iterations ≈ 8 h to superhuman connect4 on a GTX 1070
+ i5-4690 (4 cores) with the default connect4 config
(envs/connect4/train.py:17-26): 2048 games/worker/iteration x 4 workers,
200 full / 40 fast sims at probFastSim 0.75 → avg 80 sims/move, connect4
self-play averaging ~25 moves/game. That is ≥ 8192·25·80·35 ≈ 5.7e8 sims in
≤ 8 h → ~20,000 MCTS sims/s for the whole 4-core+GPU reference system —
generously assuming all wall-clock went to self-play. We use
BASELINE_SIMS_PER_S = 20_000 as the reference-system number.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_SIMS_PER_S = 20_000.0

# The reference's connect4 production config, exactly
# (envs/connect4/train.py:17-51): 2048-game batches, 200 full / 40 fast sims
# at probFastSim 0.75, ResNet 128ch x 8 blocks with 32-channel heads and
# [1024, 256] / [1024] dense head stacks.
GAMES = int(os.environ.get("BENCH_GAMES", 2048))
SIMS_FULL = int(os.environ.get("BENCH_SIMS", 200))
SIMS_FAST = int(os.environ.get("BENCH_SIMS_FAST", 40))
PROB_FAST = 0.75
MEASURE_MOVES = int(os.environ.get("BENCH_MOVES", 48))
# Deterministic fast/full schedule at exactly probFastSim's expectation
# (3 fast : 1 full) — the reference draws per move (SelfPlayAgent.pyx:84-86);
# measuring at the exact expected mix removes run-to-run mix variance.
KIND_CYCLE = ("fast", "fast", "fast", "full")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np

    from alphazero_general_tpu.envs import get_env
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.parallel import make_mesh, replicate_tree, \
        shard_selfplay_carry
    from alphazero_general_tpu.selfplay.selfplay import (
        SelfPlayConfig, init_selfplay, make_move_fns,
    )
    from alphazero_general_tpu.utils.config import get_args

    env = get_env("connect4")
    args = get_args(num_channels=128, depth=8,
                    value_head_channels=32, policy_head_channels=32,
                    value_dense_layers=[1024, 256],
                    policy_dense_layers=[1024])
    net = NNetWrapper(env, args)

    cfg = SelfPlayConfig(
        sims_full=SIMS_FULL, sims_fast=SIMS_FAST, prob_fast=PROB_FAST,
        spec=SelfPlayConfig().spec._replace(
            num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW,
        ),
    )
    # Int8-quantized self-play inference (models/quant.py) is the production
    # config (args.quant_selfplay); BENCH_NO_QUANT=1 measures the bf16 path.
    quant = not os.environ.get("BENCH_NO_QUANT")
    if quant:
        raw_vars, apply_fn = net.quantized_inference()
    else:
        raw_vars = net.state.variables
        model = net.model

        def apply_fn(variables, obs):
            return model.apply(variables, obs, train=False)

    mesh = make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    fns = make_move_fns(env, cfg, apply_fn, mesh=mesh)
    variables = replicate_tree(raw_vars, mesh)
    carry = shard_selfplay_carry(init_selfplay(env, GAMES, 1.0), mesh)

    rng = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)

    # Warmup/compile both programs.
    t0 = time.time()
    for kind in ("fast", "full"):
        rng, sub = jax.random.split(rng)
        carry, rec = fns[kind](variables, carry, sub)
    jax.block_until_ready(carry.games_played)
    compile_s = time.time() - t0

    # Measure steady state.
    del host_rng
    total_sims = 0
    games0 = int(carry.games_played)
    t0 = time.time()
    for i in range(MEASURE_MOVES):
        kind = KIND_CYCLE[i % len(KIND_CYCLE)]
        rng, sub = jax.random.split(rng)
        carry, rec = fns[kind](variables, carry, sub)
        total_sims += (SIMS_FAST if kind == "fast" else SIMS_FULL) * GAMES
    jax.block_until_ready(carry.games_played)
    elapsed = time.time() - t0
    games_done = int(carry.games_played) - games0

    sims_per_s = total_sims / elapsed
    env_steps_per_s = MEASURE_MOVES * GAMES / elapsed

    result = {
        "metric": "connect4_selfplay_mcts_sims_per_s_per_chip",
        "value": round(sims_per_s, 1),
        "unit": "sims/s/chip",
        "vs_baseline": round(sims_per_s / BASELINE_SIMS_PER_S, 2),
        "env_steps_per_s": round(env_steps_per_s, 1),
        "games_per_s": round(games_done / elapsed, 2),
        "batch_games": GAMES,
        "sims": [SIMS_FULL, SIMS_FAST, PROB_FAST],
        "devices": n_dev,
        "compile_s": round(compile_s, 1),
        "measure_s": round(elapsed, 1),
        "model": "resnet128x8",
        "int8_selfplay_inference": bool(quant),
    }
    tafl = _tafl_datapoint()
    if tafl is not None:
        result["hnefatafl_sims_per_s"] = tafl
    print(json.dumps(result))


def _tafl_datapoint():
    """Large-action-space datapoint (A=2420, XLA walk + mirror rows).

    Guarded: the tunnel intermittently refuses larger programs
    (ROADMAP infrastructure notes); the headline metric must never fail
    because of the extra."""
    if os.environ.get("BENCH_SKIP_TAFL"):
        return None
    try:
        import jax
        import jax.numpy as jnp

        from alphazero_general_tpu.envs import get_env
        from alphazero_general_tpu.mcts.search import (
            init_batched_trees, search, uniform_eval_fn,
        )
        from alphazero_general_tpu.mcts.tree import SearchSpec

        env = get_env("hnefatafl")
        B, SIMS = 512, 100
        spec = SearchSpec(num_players=2, has_draw=True)
        eval_fn = uniform_eval_fn(env.ACTION_SIZE, 3)
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))

        @jax.jit
        def run(states, rng):
            trees = init_batched_trees(env, states, SIMS + 2, 3)
            return search(env, trees, spec, eval_fn, SIMS, rng)

        jax.block_until_ready(run(states, jax.random.PRNGKey(0)))
        t0 = time.time()
        jax.block_until_ready(run(states, jax.random.PRNGKey(1)))
        return round(B * SIMS / (time.time() - t0), 1)
    except Exception:
        return None


if __name__ == "__main__":
    sys.exit(main())
