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

#: Wall-clock deadline for the OPTIONAL extra datapoints (raw search,
#: with-net self-play, train, arena). The headline metric always runs;
#: extras are skipped once the budget is spent so a cold compile cache can
#: never time the whole bench out (each skipped extra is simply absent
#: from the JSON line).
_T0 = time.time()
_EXTRA_DEADLINE_S = float(os.environ.get("BENCH_EXTRA_DEADLINE", 420))


def _over_budget() -> bool:
    return time.time() - _T0 > _EXTRA_DEADLINE_S

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
    # Raw (model-free, uniform-eval) search vs with-net self-play are NOT
    # comparable numbers (VERDICT r3 weak #3) — both ship, labeled.
    tafl = _tafl_datapoint()
    if tafl is not None:
        result["hnefatafl_raw_search_sims_per_s"] = tafl
    chess = _chess_datapoint()
    if chess is not None:
        result["chess_raw_search_sims_per_s"] = chess
    tafl_sp = _selfplay_datapoint(
        "hnefatafl", B=512, sims_full=250, sims_fast=50, fast_per_full=4,
        model_args=dict(num_channels=128, depth=10,
                        value_head_channels=32, policy_head_channels=32,
                        value_dense_layers=[4096, 128],
                        policy_dense_layers=[4096]),
        skip_env="BENCH_SKIP_TAFL_SP")
    if tafl_sp is not None:
        result["hnefatafl_selfplay_sims_per_s"] = tafl_sp
    chess_sp = _selfplay_datapoint(
        "chess", B=256, sims_full=100, sims_fast=20, fast_per_full=3,
        model_args=dict(num_channels=64, depth=6,
                        value_head_channels=32, policy_head_channels=32,
                        value_dense_layers=[512, 128],
                        policy_dense_layers=[512]),
        skip_env="BENCH_SKIP_CHESS_SP")
    if chess_sp is not None:
        result["chess_selfplay_sims_per_s"] = chess_sp
    train = _train_datapoint(env, net)
    if train is not None:
        result.update(train)
    tafl_train = _tafl_train_datapoint()
    if tafl_train is not None:
        result.update(tafl_train)
    arena = _arena_datapoint(env, net)
    if arena is not None:
        result.update(arena)
    print(json.dumps(result))


def _raw_search_datapoint(env_name: str, B: int, SIMS: int):
    """Raw-search sims/s on one env (rank-walk Pallas kernels via 'auto').

    Guarded: the tunnel intermittently refuses larger programs
    (ROADMAP infrastructure notes); the headline metric must never fail
    because of the extras."""
    try:
        import jax
        import jax.numpy as jnp

        from alphazero_general_tpu.envs import get_env
        from alphazero_general_tpu.mcts.search import (
            init_batched_trees, search, uniform_eval_fn,
        )
        from alphazero_general_tpu.mcts.tree import SearchSpec

        env = get_env(env_name)
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


def _selfplay_datapoint(env_name: str, B: int, sims_full: int,
                        sims_fast: int, fast_per_full: int,
                        model_args: dict, skip_env: str):
    """WITH-NET self-play sims/s (int8 inference tower, production sims) on
    a large-action env — the honest counterpart to the raw-search extras
    (VERDICT r3 item 4). Model/search budgets mirror the env's results/r4
    strength-run config."""
    if os.environ.get(skip_env) or _over_budget():
        return None
    try:
        import jax
        import numpy as np

        from alphazero_general_tpu.envs import get_env
        from alphazero_general_tpu.models import NNetWrapper
        from alphazero_general_tpu.parallel import make_mesh, \
            replicate_tree, shard_selfplay_carry
        from alphazero_general_tpu.selfplay.selfplay import (
            SelfPlayConfig, init_selfplay, make_move_fns,
        )
        from alphazero_general_tpu.utils.config import get_args

        env = get_env(env_name)
        net = NNetWrapper(env, get_args(**model_args))
        if os.environ.get("BENCH_NO_QUANT"):
            model = net.model
            raw_vars = net.state.variables

            def apply_fn(variables, obs):
                return model.apply(variables, obs, train=False)
        else:
            raw_vars, apply_fn = net.quantized_inference()
        cfg = SelfPlayConfig(
            sims_full=sims_full, sims_fast=sims_fast,
            prob_fast=fast_per_full / (fast_per_full + 1),
            spec=SelfPlayConfig().spec._replace(
                num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW))
        mesh = make_mesh()
        fns = make_move_fns(env, cfg, apply_fn, mesh=mesh)
        variables = replicate_tree(raw_vars, mesh)
        carry = shard_selfplay_carry(init_selfplay(env, B, 1.0), mesh)
        rng = jax.random.PRNGKey(0)
        cycle = ("fast",) * fast_per_full + ("full",)
        for kind in ("fast", "full"):  # compile
            rng, sub = jax.random.split(rng)
            carry, _ = fns[kind](variables, carry, sub)
        jax.block_until_ready(carry.games_played)
        moves = 2 * len(cycle)
        total_sims = 0
        t0 = time.time()
        for i in range(moves):
            kind = cycle[i % len(cycle)]
            rng, sub = jax.random.split(rng)
            carry, _ = fns[kind](variables, carry, sub)
            total_sims += (sims_fast if kind == "fast" else sims_full) * B
        jax.block_until_ready(carry.games_played)
        return round(total_sims / (time.time() - t0), 1)
    except Exception:
        return None


def _tafl_datapoint():
    """Large-action-space datapoint (hnefatafl, A=2420)."""
    if os.environ.get("BENCH_SKIP_TAFL") or _over_budget():
        return None
    B = int(os.environ.get("BENCH_TAFL_GAMES", 1024))
    return _raw_search_datapoint("hnefatafl", B, 100)


def _chess_datapoint():
    """Largest action space (chess, A=4672 — the reference's chess is a dead
    stub, chess.py:82-92; this datapoint has no reference counterpart)."""
    if os.environ.get("BENCH_SKIP_CHESS") or _over_budget():
        return None
    B = int(os.environ.get("BENCH_CHESS_GAMES", 256))
    return _raw_search_datapoint("chess", B, 100)


def _train_datapoint(env, net):
    """Train-step throughput on the production connect4 model: examples/s
    and model FLOPs utilization (FLOPs from XLA's own cost analysis of the
    compiled step). Reference analogue: the torch DataLoader+SGD loop,
    NNetWrapper.py:123-205."""
    if os.environ.get("BENCH_SKIP_TRAIN") or _over_budget():
        return None
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        B = int(os.environ.get("BENCH_TRAIN_BATCH", 1024))
        obs = jnp.asarray(
            np.random.default_rng(0).random(
                (B,) + tuple(env.OBS_SHAPE), np.float32))
        pi = jnp.full((B, env.ACTION_SIZE), 1.0 / env.ACTION_SIZE)
        val = jnp.full((B, 3), 1.0 / 3)
        state = net.state

        step = net._jit_train_step
        lowered = step.lower(state, (obs, pi, val), 1e-3)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = (cost or {}).get("flops", 0.0)
        state2, _ = compiled(state, (obs, pi, val), 1e-3)
        jax.block_until_ready(state2.params)
        steps = 20
        t0 = time.time()
        for _ in range(steps):
            state2, _ = compiled(state2, (obs, pi, val), 1e-3)
        jax.block_until_ready(state2.params)
        dt = time.time() - t0
        out = {
            "train_examples_per_s": round(steps * B / dt, 1),
            "train_batch": B,
        }
        if flops:
            # bf16 peak of one v5e-class chip; report the ratio as-is so the
            # hardware assumption is explicit in the artifact.
            PEAK = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
            out["train_mfu_pct_at_197tflops"] = round(
                100.0 * flops * steps / dt / PEAK, 2)
        return out
    except Exception:
        return None


def _tafl_train_datapoint():
    """STEADY-STATE train step at the hnefatafl flagship config (128ch x 10,
    batch 2048) on the PRODUCTION feed path — device-resident window ring +
    in-step row gather + per-sample device symmetry (VERDICT r4 weak #6:
    the connect4 headline hid the large-config steady state; this is the
    number the strength runs actually train at)."""
    if os.environ.get("BENCH_SKIP_TAFL_TRAIN") or _over_budget():
        return None
    try:
        import jax
        import numpy as np

        from alphazero_general_tpu.envs import get_env
        from alphazero_general_tpu.models import NNetWrapper
        from alphazero_general_tpu.selfplay.device_window import DeviceWindow
        from alphazero_general_tpu.utils.config import get_args

        env = get_env("hnefatafl")
        B = int(os.environ.get("BENCH_TAFL_TRAIN_BATCH", 2048))
        ROWS = int(os.environ.get("BENCH_TAFL_TRAIN_ROWS", 262144))
        net = NNetWrapper(env, get_args(
            num_channels=128, depth=10,
            value_head_channels=32, policy_head_channels=32,
            value_dense_layers=[4096, 128], policy_dense_layers=[4096]))
        net.set_device_symmetries(env)
        net.set_device_window(True)
        ring = DeviceWindow(env.OBS_SHAPE, env.ACTION_SIZE, 3, ROWS)
        rng = np.random.default_rng(0)
        chunk = 65536  # upload in slices, host RAM friendly
        for start in range(0, ring.rows, chunk):
            n = min(chunk, ring.rows - start)
            ring.add_iteration(
                1 + start // chunk,
                rng.random((n,) + tuple(env.OBS_SHAPE)).astype(np.float16),
                rng.random((n, env.ACTION_SIZE)).astype(np.float16),
                rng.random((n, 3)).astype(np.float32))

        def batch(i):
            return ring.buffers + (
                rng.integers(0, ring.rows, B).astype(np.int32),
                rng.integers(0, env.NUM_SYMMETRIES, B).astype(np.int32))

        state = net.state
        step = net._jit_train_step
        lowered = step.lower(state, batch(0), 1e-3)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = (cost or {}).get("flops", 0.0)
        state, _ = compiled(state, batch(0), 1e-3)
        jax.block_until_ready(state.params)
        steps = 12
        bs = [batch(i) for i in range(steps)]  # pre-draw host indices
        t0 = time.time()
        for b in bs:
            state, _ = compiled(state, b, 1e-3)
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        out = {
            "tafl_train_s_per_step_128ch_x10_b2048": round(dt / steps, 4),
            "tafl_train_examples_per_s": round(steps * B / dt, 1),
        }
        if flops:
            PEAK = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
            out["tafl_train_mfu_pct_at_197tflops"] = round(
                100.0 * flops * steps / dt / PEAK, 2)
        return out
    except Exception:
        return None


def _arena_datapoint(env, net):
    """Arena games/s + the owner-routing speedup measured as wallclock A/B
    (route_owner True vs the every-model-evaluates-all fallback) — the
    reference flags batched arena as ~10x slower than self-play
    (Arena.pyx:209)."""
    if os.environ.get("BENCH_SKIP_ARENA") or _over_budget():
        return None
    try:
        import jax

        from alphazero_general_tpu.selfplay.arena import (
            ArenaConfig, play_games_multi,
        )

        import jax.numpy as jnp

        B = int(os.environ.get("BENCH_ARENA_GAMES", 256))
        SIMS = 100
        model = net.model
        variables = net.state.variables
        # A genuinely DIFFERENT second model: with identical variables XLA
        # CSEs the unrouted path's two forwards into one, hiding the very
        # cost owner routing removes (measured: 0.99x "speedup").
        variables2 = jax.tree_util.tree_map(
            lambda x: x * 1.001 if jnp.issubdtype(x.dtype, jnp.floating)
            else x, variables)

        def apply_fn(v, obs):
            return model.apply(v, obs, train=False)

        out = {}
        for routed in (True, False):
            cfg = ArenaConfig(
                sims=SIMS, route_owner=routed,
                spec=ArenaConfig().spec._replace(
                    num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW))

            fn = jax.jit(lambda rng, cfg=cfg: play_games_multi(
                env, cfg, [apply_fn, apply_fn], [variables, variables2],
                B, rng))
            jax.block_until_ready(fn(jax.random.PRNGKey(0)).model_wins)
            t0 = time.time()
            jax.block_until_ready(fn(jax.random.PRNGKey(1)).model_wins)
            dt = time.time() - t0
            key = ("arena_games_per_s" if routed
                   else "arena_games_per_s_unrouted")
            out[key] = round(B / dt, 2)
        if out.get("arena_games_per_s_unrouted"):
            out["arena_owner_routing_speedup"] = round(
                out["arena_games_per_s"]
                / out["arena_games_per_s_unrouted"], 2)
        return out
    except Exception:
        return None


if __name__ == "__main__":
    sys.exit(main())
