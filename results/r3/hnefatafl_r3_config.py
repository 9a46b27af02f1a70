"""Round-3 hnefatafl 11x11 gated training reproduction (VERDICT r2 item 3;
BASELINE.json named config; reference entry:
alphazero/envs/hnefatafl/train_fastafl.py:1-60, strength anecdote
README.md:131-136). First training curve on the full 11x11 board in this
repo — rides the round-3 rank-walk kernel (A=2420 runs the same slim Pallas
descent as connect4). Model sized like the brandubh curve run (64ch x 6; the
reference's 128ch x 10 would triple the iteration time for the same
curve-shape evidence); search budget 100/20 like every archived curve."""
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
    numIters=18,
    numWarmupIters=1,
    process_batch_size=512,
    gamesPerIteration=1024,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=4.0, fpu_reduction=0.4,
    train_batch_size=1024,
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
