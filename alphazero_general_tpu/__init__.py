"""alphazero_general_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX/XLA re-design of the capabilities of
kevaday/alphazero-general (reference surveyed in SURVEY.md): vectorized
board-game environments stepped in lockstep under jit, an array-tree batched
MCTS, a flax ResNet policy+value learner, jitted self-play / arena / gating,
Elo round-robin ranking, checkpoint/resume and JSON-configurable
hyperparameters — sharded over TPU meshes with `jax.sharding` instead of the
reference's multiprocess + shared-memory runtime (reference:
alphazero/Coach.py:290-361, alphazero/SelfPlayAgent.pyx:13-203).
"""

__version__ = "0.1.0"

from alphazero_general_tpu.utils.config import Args, get_args, DEFAULT_ARGS  # noqa: F401
from alphazero_general_tpu.utils.config import load_args_file, save_args_file  # noqa: F401
