"""Resume of hnefatafl_r3 after the round-3 replay-memory fixes (the
original run OOM'd at iteration-2 train loading a 6M-sample window dense -
see results/r3/README.md). Resumes from the existing checkpoints (iter 0-1)
and REUSES the already-collected iteration-1/2 sample files
(skipSelfPlayIters=2); window capped at 2M training samples; fixed 600
train steps/iteration (autoTrainSteps on a 3M-sample warmup iteration means
~2900 steps - most of an hour of feed time for one iteration)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "hnefatafl_r3"
env = get_env("hnefatafl")
args = get_args(
    run_name=RUN,
    seed=7,
    numIters=7,
    numWarmupIters=1,
    skipSelfPlayIters=2,
    process_batch_size=512,
    gamesPerIteration=1024,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=4.0, fpu_reduction=0.4,
    train_batch_size=1024,
    autoTrainSteps=False, train_steps_per_iteration=600,
    maxWindowSamples=2_000_000,
    arenaCompare=64, arenaCompareBaseline=64, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    minTrainHistoryWindow=4, maxTrainHistoryWindow=12,
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
