"""Configuration system.

Mirrors the reference's single-schema config surface (reference:
alphazero/Coach.py:25-117 `DEFAULT_ARGS`, alphazero/utils.py:1-12 `dotdict`,
alphazero/__init__.py:18-52 JSON round-trip) with two deliberate changes:

* callables are serialized as ``"__CALLABLE__<name>"`` and revived through an
  explicit registry — never ``eval`` (the reference revives via ``eval``,
  flagged as a hazard in SURVEY.md §5.6);
* TPU-specific keys (mesh axes, per-device batch, dtypes) replace the
  reference's process/worker keys.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

# ---------------------------------------------------------------------------
# Registry for JSON-serializable callables (reference encodes these with the
# "__CALLABLE__" prefix and revives with eval; we use an allow-list instead).
# ---------------------------------------------------------------------------

_CALLABLE_PREFIX = "__CALLABLE__"
_REGISTRY: Dict[str, Any] = {}


def register_callable(obj: Callable, name: str | None = None) -> Callable:
    """Register a callable/class so it can round-trip through JSON args files."""
    _REGISTRY[name or obj.__name__] = obj
    return obj


def resolve_callable(name: str) -> Any:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown callable {name!r} in args file. Register it with "
            f"alphazero_general_tpu.utils.config.register_callable first."
        )
    return _REGISTRY[name]


class Args(dict):
    """Attribute-access dict, the frame-wide hyperparameter container.

    Same surface as the reference `dotdict` (alphazero/utils.py:1-12).
    """

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - defensive
            raise AttributeError(name) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def copy(self) -> "Args":
        return self.__class__(super().copy())


def _register_builtins() -> None:
    """Pre-register the framework's serializable callables so args files load
    in fresh processes (the reference revives these by eval against a fixed
    import namespace, alphazero/__init__.py:29-37)."""
    from alphazero_general_tpu.utils import misc

    for fn in (misc.default_temp_scaling, misc.const_temp_scaling,
               misc.scale_temp):
        _REGISTRY.setdefault(fn.__name__, fn)


# ---------------------------------------------------------------------------
# Default args. Key names follow the reference (alphazero/Coach.py:25-117) so
# users of the reference find the same knobs; keys starting with '_' are
# derived/internal. TPU-specific additions are grouped at the bottom.
# ---------------------------------------------------------------------------

def _build_default_args() -> Args:
    from alphazero_general_tpu.utils.misc import default_temp_scaling

    return Args(
        run_name="boardgame",
        startIter=0,
        numIters=1000,
        # Number of games played in lockstep on device (reference:
        # process_batch_size per worker; here it is the global game batch,
        # sharded over the mesh 'batch' axis).
        process_batch_size=256,
        train_batch_size=1024,
        arena_batch_size=64,
        train_steps_per_iteration=64,
        train_sample_ratio=1,
        averageTrainSteps=False,
        autoTrainSteps=True,
        train_on_past_data=False,
        past_data_chunk_size=25,
        past_data_run_name="boardgame",
        gamesPerIteration=1024,
        minTrainHistoryWindow=4,
        maxTrainHistoryWindow=20,
        trainHistoryIncrementIters=2,
        _num_players=None,  # set automatically: num_players + has_draw
        min_discount=1.0,
        fpu_reduction=0.2,
        num_stacked_observations=1,
        numWarmupIters=1,
        skipSelfPlayIters=None,
        selfPlayModelIter=None,
        symmetricSamples=True,
        numMCTSSims=100,
        numFastSims=20,
        numWarmupSims=5,
        probFastSim=0.75,
        mctsResetThreshold=None,
        startTemp=1.0,
        temp_scaling_fn=default_temp_scaling,
        root_policy_temp=1.1,
        root_noise_frac=0.1,
        add_root_noise=True,
        add_root_temp=True,
        compareWithBaseline=True,
        baselineTester="rawmcts",  # name of a registered baseline player
        arenaCompareBaseline=128,
        arenaCompare=128,
        arenaTemp=0.25,
        arenaMCTS=True,
        arenaBatched=True,
        baselineCompareFreq=1,
        compareWithPast=True,
        pastCompareFreq=1,
        model_gating=True,
        max_gating_iters=None,
        min_next_model_winrate=0.52,
        use_draws_for_winrate=True,
        # Gate decision rule (train/coach.py compare_to_past):
        #   "reference": winrate incl. half-credit draws >= threshold — the
        #     reference's exact math (reference: Coach.py:558-572). At a
        #     512-move draw cap tafl past-arenas run 50-80% draws, pinning
        #     this winrate near 0.5: promotion at 0.52 then needs ~2/3 of
        #     DECIDED games, and the gate can deadlock while real progress
        #     continues (hnefatafl r4 iteration 14: 0.473, no promotion).
        #   "decided": wins_new / decided >= threshold, requiring at least
        #     gateMinDecided decided games (else: no promotion, counter
        #     still advances toward max_gating_iters). Draw-heavy envs keep
        #     promoting on the signal draws can't dilute.
        # Offline A/B on the r4 curves: results/r5/gating_ab.md.
        gatingRule="reference",
        gateMinDecided=16,
        load_model=True,
        cpuct=1.25,
        value_loss_weight=1.5,
        checkpoint="checkpoint",
        data="data",
        # Optimizer / schedule (reference defaults: SGD momentum 0.9, wd 1e-4,
        # lr 1e-2, MultiStepLR milestones [75, 125] gamma 0.1 —
        # alphazero/Coach.py:89-105). Implemented with optax.
        optimizer="sgd",
        optimizer_args=Args(momentum=0.9, weight_decay=1e-4, nesterov=False),
        scheduler="multistep",
        scheduler_args=Args(milestones=[75, 125], gamma=0.1),
        lr=1e-2,
        # Network (reference: alphazero/Coach.py:107-116)
        nnet_type="resnet",  # 'resnet' or 'fc'
        num_channels=32,
        depth=4,
        value_head_channels=16,
        policy_head_channels=16,
        input_fc_layers=[1024] * 4,
        value_dense_layers=[512, 64],
        policy_dense_layers=[512, 256],
        # --- TPU-native additions (no reference equivalent) ------------------
        # Mesh axis sizes; data-parallel game/batch axis. -1 = all devices.
        mesh_batch_axis=-1,
        # Compute dtype for the network forward/backward (params stay f32).
        compute_dtype="bfloat16",
        # Norm layer: 'batchnorm' matches the reference; 'groupnorm' avoids
        # running statistics and is usually preferable on TPU.
        norm="batchnorm",
        # Fixed base RNG seed for reproducible runs (reference has none).
        seed=0,
        # Number of moves executed per jitted self-play chunk.
        selfplay_chunk_moves=16,
        # Keep at most this many nodes in a search tree arena
        # (0 = numMCTSSims + 2, doubled under reuse_tree).
        max_tree_nodes=0,
        # Carry search trees across moves, re-rooted at the played action
        # (the reference's update_root reuse). Opt-in pending Elo A/B.
        reuse_tree=False,
        # Leaves evaluated per network call during search (multi-leaf
        # rounds, virtual-loss style). 1 = the reference's exact
        # 1-leaf-per-step semantics; >1 departs from them (opt-in) and
        # requires the fresh-tree game-minor kernel path.
        leaf_batch=1,
        # Int8-quantized network tower for self-play inference
        # (models/quant.py): ~1.3x self-play throughput on TPU v5e.
        # Training/arena stay bf16. Requires resnet + batchnorm; silently
        # falls back otherwise. Strength-validated on a 16-iteration gated
        # connect4 run (results/README.md): baseline winrate 0.71 → 0.95-0.98,
        # matching/exceeding the bf16 run's curve.
        quant_selfplay=True,
        # Device-trace capture: when set, each Coach phase (self-play /
        # train / arena) writes a jax.profiler trace to
        # <profile_dir>/<phase>-iterNNN (first 3 occurrences per phase) —
        # TensorBoard-profile/XProf viewable. Phase wall-times are always
        # recorded as time/<phase> scalars regardless (utils/trace.py;
        # replaces the reference's console/GUI timing meters,
        # Coach.py:327-355).
        profile_dir="",
    )


DEFAULT_ARGS = _build_default_args()


def get_args(args: Args | dict | None = None, **kwargs) -> Args:
    """Merge overrides into a fresh copy of the defaults.

    Same call surface as the reference's `get_args` (alphazero/Coach.py:120-126)
    but returns a copy instead of mutating the global defaults.
    """
    new_args = _build_default_args()
    if args:
        new_args.update(args)
    for key, value in kwargs.items():
        new_args[key] = value
    return new_args


# ---------------------------------------------------------------------------
# JSON round-trip (reference: alphazero/__init__.py:18-52, minus eval).
# ---------------------------------------------------------------------------

def _encode(value: Any) -> Any:
    if isinstance(value, dict):
        return {k: _encode(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if callable(value):
        name = getattr(value, "__name__", None)
        if name is None:  # pragma: no cover - defensive
            raise TypeError(f"Cannot serialize callable without __name__: {value!r}")
        _REGISTRY.setdefault(name, value)
        return _CALLABLE_PREFIX + name
    return value


def _decode(value: Any) -> Any:
    if isinstance(value, dict):
        return Args({k: _decode(v) for k, v in value.items()})
    if isinstance(value, list):
        return [_decode(v) for v in value]
    if isinstance(value, str) and value.startswith(_CALLABLE_PREFIX):
        return resolve_callable(value[len(_CALLABLE_PREFIX):])
    return value


def save_args_file(args: Args, filepath: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    with open(filepath, "w") as f:
        json.dump(_encode(dict(args)), f, indent=2, sort_keys=True)


def load_args_file(filepath: str) -> Args:
    _register_builtins()
    with open(filepath) as f:
        raw = json.load(f)
    return _decode(raw)
