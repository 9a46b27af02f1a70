"""Train an AlphaZero model: ``python -m alphazero_general_tpu.cli.train <env>``.

Replaces the reference's per-env train scripts
(reference: alphazero/envs/*/train.py, README.md:49).
"""

from __future__ import annotations

import argparse

from alphazero_general_tpu.cli.common import (
    add_args_overrides,
    add_env_arg,
    enable_compile_cache,
    resolve_args,
    resolve_env,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_env_arg(p)
    add_args_overrides(p)
    p.add_argument(
        "--devices", default="all",
        help="devices for the data-parallel batch mesh: 'all' (default — a "
             "user with N chips gets N chips), or an integer count",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="initialize jax.distributed for multi-host runs (also attempted "
             "automatically when JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES "
             "are set); every host runs this same command",
    )
    ns = p.parse_args(argv)

    if ns.distributed:
        from alphazero_general_tpu.parallel import init_distributed

        if init_distributed():
            import jax

            print(f"[distributed] process {jax.process_index()}/"
                  f"{jax.process_count()}, {jax.device_count()} devices")

    enable_compile_cache()
    env = resolve_env(ns)
    args = resolve_args(ns)
    args.mesh_batch_axis = -1 if ns.devices == "all" else int(ns.devices)

    from alphazero_general_tpu.envs.stacked import maybe_stack
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.train import Coach

    env = maybe_stack(env, args)

    nnet = NNetWrapper(env, args)
    coach = Coach(env, nnet, args)
    try:
        coach.learn()
    except KeyboardInterrupt:
        print("\nInterrupted; checkpoints are saved per-iteration.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
