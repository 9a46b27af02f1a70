"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import ast

from alphazero_general_tpu.envs import get_env, list_envs
from alphazero_general_tpu.envs.presets import preset_args
from alphazero_general_tpu.utils.config import Args, load_args_file


def add_env_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument("env", help=f"environment name ({', '.join(list_envs())})")


def add_args_overrides(p: argparse.ArgumentParser) -> None:
    p.add_argument("--args-file", help="JSON args file (save_args_file format)")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override an arg, e.g. --set numMCTSSims=50 (repeatable; values "
             "parsed as Python literals, falling back to string)",
    )


def resolve_args(ns: argparse.Namespace) -> Args:
    if ns.args_file:
        args = load_args_file(ns.args_file)
        from alphazero_general_tpu.utils.config import get_args

        args = get_args(args)
    else:
        args = preset_args(ns.env)
    for item in ns.set:
        key, _, raw = item.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        args[key] = value
    return args


def resolve_env(ns: argparse.Namespace):
    return get_env(ns.env)


def enable_compile_cache() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass


def add_device_arg(p: argparse.ArgumentParser, default: str = "auto") -> None:
    p.add_argument(
        "--device", choices=["auto", "cpu", "tpu"], default=default,
        help="compute backend; interactive tools default to cpu (B=1 play "
             "gains nothing from a TPU and avoids its compile latency)",
    )


def apply_device(ns: argparse.Namespace) -> None:
    if getattr(ns, "device", "auto") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # 'tpu'/'auto': leave the platform to the environment.
