"""Final round-1 connect4 gated run: all optimizations (int8 self-play,
segmented bitmask walk, 3-D TreeT) at the r1 recipe, 30 iterations."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

env = get_env("connect4")
args = get_args(
    run_name="connect4_final",
    numIters=30,
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
)
net = NNetWrapper(env, args)
Coach(env, net, args).learn()
print("TRAINING DONE")
