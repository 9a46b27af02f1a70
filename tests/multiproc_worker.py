"""Worker for the 2-simulated-process multi-host validation (SURVEY.md §2.5
TPU-equivalents; VERDICT.md round-1 item 9).

Launched twice by tests/test_multiproc.py (process 0 and 1) on localhost:
each process owns 2 virtual CPU devices, `jax.distributed.initialize` forms
the 4-device global mesh, and a tiny Coach runs one full iteration cycle
data-parallel across both processes — self-play (per-host game slices,
per-host sample files), training (global-batch grad psum from per-host
feeds), arenas, gating, process-0-only checkpointing.

Run directly:  python tests/multiproc_worker.py <proc_id> <num_procs> <port> <workdir>
"""
import os
import sys

proc_id, num_procs, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

# Shared CPU bootstrap (tests/_cpu_mesh_bootstrap.py), 2 devices per process.
os.environ["AZG_TEST_DEVICE_COUNT"] = "2"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cpu_mesh_bootstrap  # noqa: F401, E402

import jax  # noqa: E402
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
    # Default barrier timeout flakes when this 2-core host is under parallel
    # test load (VERDICT r3 weak #6) — the barrier is pure waiting, so a
    # generous timeout costs nothing when unloaded.
    initialization_timeout=600,
)
assert jax.process_count() == num_procs
assert jax.device_count() == 2 * num_procs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_general_tpu.envs.tictactoe import TicTacToe  # noqa: E402
from alphazero_general_tpu.models import NNetWrapper  # noqa: E402
from alphazero_general_tpu.train import Coach  # noqa: E402
from alphazero_general_tpu.utils.config import get_args  # noqa: E402

args = get_args(
    run_name="mp",
    checkpoint=os.path.join(workdir, "checkpoint"),
    data=os.path.join(workdir, "data"),
    seed=5,
    numIters=1, numWarmupIters=1,
    process_batch_size=8, gamesPerIteration=8,
    numMCTSSims=6, numFastSims=3, numWarmupSims=4,
    train_batch_size=8, arenaCompare=8, arenaCompareBaseline=8,
    num_channels=8, depth=1, value_head_channels=2, policy_head_channels=2,
    value_dense_layers=[8], policy_dense_layers=[8],
    compute_dtype="float32",
)
net = NNetWrapper(TicTacToe, args)
coach = Coach(TicTacToe, net, args)
assert coach.mesh is not None and coach.mesh.devices.size == 2 * num_procs
coach.learn()

import numpy as np  # noqa: E402

leaves = jax.tree_util.tree_leaves(coach.train_net.state.params)
digest = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
print(f"MPOK proc={proc_id} params_digest={digest:.6f}")
