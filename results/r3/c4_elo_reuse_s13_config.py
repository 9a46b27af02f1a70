"""Round-3 SECOND SEED (seed=13) of the reuse_tree Elo A/B (VERDICT r2 item 7).
Round-2 connect4 gated run B: reuse_tree=True (the reference's
default update_root tree-reuse semantics, MCTS.pyx:185-195) — the B arm of
the reuse_tree A/B against c4_elo_base. Same recipe as the
archived round-1 `connect4_final` run, with a pinned seed so the A/B runs
share self-play RNG structure.

Horizon note: 15 iterations, matching c4_elo_base_s13_config.py — see the
rationale there (the round-2 gap is fully established by @15)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "c4_elo_reuse_s13"
env = get_env("connect4")
args = get_args(
    run_name=RUN,
    seed=13,
    numIters=15,
    numWarmupIters=1,
    process_batch_size=2048,
    gamesPerIteration=4096,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=4.0, fpu_reduction=0.4,
    train_batch_size=1024,
    arenaCompare=128, arenaCompareBaseline=128, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    minTrainHistoryWindow=4, maxTrainHistoryWindow=16,
    reuse_tree=True,
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
