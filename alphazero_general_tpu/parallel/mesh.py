"""Device mesh + sharding layer.

The reference scales by forking worker processes on one host and funnelling
all NN evals through one GPU via shared-memory tensors (reference:
Coach.py:290-361, SelfPlayAgent.pyx; SURVEY.md §2.5). The TPU-native
replacement: one logical program, sharded.

* mesh axis ``batch``: data parallelism over games (self-play, arena) and
  over training minibatches. Parameters are replicated; XLA inserts the
  gradient ``psum`` over ICI automatically from the shardings — the one
  collective this workload needs (SURVEY.md §2.5).
* multi-host: the same code runs under ``jax.distributed`` with a global mesh;
  per-host data feeds shard along ``batch``.
"""

from __future__ import annotations



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the batch axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh):
    """Place a pytree with all leaves sharded on their leading axis."""
    sh = batch_sharding(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1:
            spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    del sh
    return jax.tree_util.tree_map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def make_sharded_train_step(wrapper, mesh: Mesh):
    """Data-parallel training step over the mesh.

    Params/opt state replicated; batch sharded on its leading axis. The
    gradient all-reduce is inserted by XLA from these shardings (no explicit
    psum needed under jit-with-shardings).
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    return jax.jit(
        wrapper._train_step,
        in_shardings=(rep, (data, data, data), None),
        out_shardings=(rep, None),
    )


def make_sharded_play_chunk(env, cfg, apply_fn, num_moves: int, mesh: Mesh,
                            warmup: bool = False):
    """Self-play chunk with the game batch sharded over devices.

    Replaces the reference's "one worker process per CPU core" actor fan-out
    (Coach.py:294-323): every device owns process_batch_size/n games of the
    lockstep vector; the network evaluation inside the search runs fully
    sharded with replicated parameters, so no device ever waits on a central
    inference server.
    """
    from alphazero_general_tpu.selfplay.selfplay import play_chunk

    import jax.numpy as jnp

    rep = replicated(mesh)

    def run(variables, carry, rng):
        def eval_fn(obs):
            logp, logv = apply_fn(variables, obs)
            return jnp.exp(logp), jnp.exp(logv)

        return play_chunk(env, cfg, eval_fn, carry, rng, num_moves,
                          warmup=warmup)

    return jax.jit(run, in_shardings=(rep, None, rep), donate_argnums=(1,))


def shard_selfplay_carry(carry, mesh: Mesh):
    """Shard a SelfPlayState on the game axis; scalars replicated."""

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] > 1:
            spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, carry)
