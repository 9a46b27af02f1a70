"""Round-3 chess end-to-end gated run (VERDICT r2 item 2): first Coach
cycle ever driven at A=4672. The reference's chess env is a dead stub
(reference: alphazero/envs/chess/chess.py:82-92 — play_action/win_state/
observation are `pass`), so this run has no reference counterpart to match;
it demonstrates the claim that every env in this repo trains end-to-end.

Memory plan: the per-move fresh tree at 100 sims holds a [B, 102, 4672] f32
prior buffer = 487 MB at B=256 plus bool valids (122 MB) — comfortably in
HBM; the 512-move draw cap bounds K; samples stream to disk via the
round-3 StreamingFinalizer (host RSS O(flush window))."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "chess_r3"
env = get_env("chess")
args = get_args(
    run_name=RUN,
    seed=11,
    numIters=4,
    numWarmupIters=1,
    process_batch_size=256,
    gamesPerIteration=512,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=2.5, fpu_reduction=0.4,
    train_batch_size=512,
    arenaCompare=32, arenaCompareBaseline=32, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    symmetricSamples=False,  # chess has no board symmetry
    minTrainHistoryWindow=2, maxTrainHistoryWindow=6,
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
