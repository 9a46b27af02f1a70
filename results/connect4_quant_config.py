"""Quant-validation run: the r1 connect4 config with quant_selfplay=True.

Compares against results/connect4_r1_metrics.jsonl (bf16 self-play): the
win_rate/baseline curve should climb comparably if int8 self-play inference
is strength-neutral.
"""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

env = get_env("connect4")
args = get_args(
    run_name="connect4_quant",
    numIters=16,
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
    quant_selfplay=True,
)
net = NNetWrapper(env, args)
coach = Coach(env, net, args)
coach.learn()
print("TRAINING DONE")
