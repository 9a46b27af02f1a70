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


def usable_devices(requested: int, *batch_sizes: int) -> int:
    """Largest device count ≤ ``requested`` that divides every batch size.

    The game/batch axes are sharded evenly over the mesh; a batch that does
    not divide would need padding, so the production path instead shrinks the
    mesh (and warns) — the reference's analogue is capping worker count at
    cpu_count (Coach.py:294)."""
    n = jax.device_count() if requested in (-1, 0) else int(requested)
    n = max(1, min(n, jax.device_count()))
    sizes = [int(b) for b in batch_sizes if int(b) > 0]
    d = n
    while d > 1 and any(b % d for b in sizes):
        d -= 1
    if d != n:
        print(f"[mesh] shrinking batch mesh {n} -> {d} devices so batch "
              f"sizes {sizes} shard evenly")
    return d


def init_distributed() -> bool:
    """Initialize multi-process JAX when a coordinator is configured.

    Multi-host design (SURVEY.md §2.5 TPU equivalents): every host runs this
    same program; ``jax.distributed.initialize`` discovers the coordinator
    from the TPU/cluster environment (or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when set explicitly), after which
    ``jax.devices()`` spans the whole slice and the batch mesh covers it.
    Per-host duties: the Coach host loop is replicated (same args + seed →
    same host-side decisions on every process); self-play carries are created
    with :func:`host_local_to_global` so each host materializes only its own
    shard of the game batch; RNG keys are identical on all hosts (the sharded
    program splits per-game keys from them on device, so game streams never
    collide across hosts). Returns True when distributed mode was activated.
    """
    import os

    if jax.process_count() > 1:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = os.environ.get("JAX_NUM_PROCESSES")
    if addr and num and int(num) > 1:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )
        return True
    try:  # TPU pod environments self-describe; harmless no-op elsewhere.
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception:
        return False


def local_rows(x) -> np.ndarray:
    """Host-local rows of a batch-sharded global array.

    Single-process: the whole array. Multi-process: only this host's shards
    of the global batch, concatenated in index order — each host extracts
    exactly its own games' records, so per-host sample files partition the
    global sample set with no duplicates (the per-host data-feed /
    sample-dedup story of SURVEY.md §2.5)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(
        (s for s in x.addressable_shards),
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local_to_global(tree, mesh: Mesh):
    """Assemble a globally-sharded pytree from per-host local shards.

    Single-process: equivalent to :func:`shard_leading_axis`. Multi-process:
    each host passes arrays covering only its slice of the global batch
    (global_batch / process_count rows) and the result is a global jax.Array
    over the mesh — the per-host data feed of SURVEY.md §2.5."""
    if jax.process_count() == 1:
        return shard_leading_axis(tree, mesh)
    from jax.experimental import multihost_utils

    def spec(x):
        if getattr(x, "ndim", 0) >= 1:
            return P(BATCH_AXIS, *([None] * (x.ndim - 1)))
        return P()

    specs = jax.tree_util.tree_map(spec, tree)
    return multihost_utils.host_local_array_to_global_array(tree, mesh, specs)


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
    if jax.process_count() > 1:
        # Every host holds the full value (same params everywhere); assemble
        # the replicated global array from the per-host copies.
        from jax.experimental import multihost_utils

        specs = jax.tree_util.tree_map(lambda _: P(), tree)
        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, specs)
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

    # ``data`` as a pytree prefix covers the whole batch tuple — 3-tuple
    # expanded batches and 4-tuple (obs, pi, value, sym_idx) device-symmetry
    # batches alike shard on their leading (sample) axis.
    return jax.jit(
        wrapper._train_step,
        in_shardings=(rep, data, None),
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
    """Shard a SelfPlayState on the game axis; scalars replicated.

    Multi-process: the carry passed in covers only this host's slice of the
    global game batch (global_batch / process_count games) and is assembled
    into global arrays (see Coach.generate_self_play_data)."""
    if jax.process_count() > 1:
        return host_local_to_global(carry, mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] > 1:
            spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, carry)
