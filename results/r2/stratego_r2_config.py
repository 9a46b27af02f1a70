"""Round-2 stratego gated run (sized so the warmup iteration's
finalize fits HBM: random-play stratego games run to the 512-move draw cap,
so samples/iteration ~ games x 512 x 30-plane obs) (VERDICT round-1 item 10): exercises the
two-phase action space (placement palette then rook/scout movement, A=1280,
imperfect-information obs censoring) end-to-end through self-play -> train ->
gating -> baseline, the way the reference's stratego train script does
(reference: alphazero/envs/stratego/train.py)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "stratego_r2"
env = get_env("stratego")
args = get_args(
    run_name=RUN,
    seed=11,
    numIters=10,
    numWarmupIters=1,
    process_batch_size=256,
    gamesPerIteration=512,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=4.0, fpu_reduction=0.4,
    train_batch_size=1024,
    arenaCompare=64, arenaCompareBaseline=64, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    minTrainHistoryWindow=2, maxTrainHistoryWindow=8,
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
