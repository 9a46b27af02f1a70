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
    ns = p.parse_args(argv)

    enable_compile_cache()
    env = resolve_env(ns)
    args = resolve_args(ns)

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
