"""Environment registry.

Discovery by name replaces the reference's directory-listing convention
(reference: AlphaZeroGUI/main.py:624-669, `alphazero/envs/<name>/<name>.py`
must define `Game`). Here envs register explicitly.
"""

from __future__ import annotations

from typing import Dict, Type

from alphazero_general_tpu.envs.core import Env, EnvState  # noqa: F401

_ENVS: Dict[str, Type[Env]] = {}


def register_env(env_cls: Type[Env]) -> Type[Env]:
    _ENVS[env_cls.NAME] = env_cls
    return env_cls


def get_env(name: str) -> Type[Env]:
    if name not in _ENVS:
        _load_builtins()
    if name not in _ENVS:
        raise KeyError(f"Unknown env {name!r}. Available: {sorted(_ENVS)}")
    return _ENVS[name]


def list_envs():
    _load_builtins()
    return sorted(_ENVS)


def _load_builtins() -> None:
    # Import side effect registers each env once.
    import importlib

    for mod in (
        "connect4",
        "tictactoe",
        "othello",
        "gobang",
        "tafl",
        "stratego",
        "chess",
        "nim",
    ):
        try:
            m = importlib.import_module(f"alphazero_general_tpu.envs.{mod}")
        except ImportError:
            continue
        for obj in vars(m).values():
            if (
                isinstance(obj, type)
                and issubclass(obj, Env)
                and obj is not Env
                and getattr(obj, "NAME", None)
                and obj.ACTION_SIZE
            ):
                _ENVS.setdefault(obj.NAME, obj)
