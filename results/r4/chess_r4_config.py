"""Round-4 chess gated run (VERDICT r3 item 3): extend the r3 2-iteration
proof to a real curve — 12 gated iterations at 64-game arenas (the r3 run's
32-game arenas carry +-0.09 binomial noise at winrate 0.25; 64 halves the
variance). Same env/model/search recipe as chess_r3 (results/r3/
chess_r3_config.py) so the curves concatenate conceptually; fresh run
name + seed so the curve is one coherent artifact. The reference's chess
env is a dead stub (reference: alphazero/envs/chess/chess.py:82-92), so
this has no reference counterpart — the claim being settled is strength,
not plumbing: a gating promotion or winrate vs RawMCTS > 0.5.

Memory plan unchanged from r3: [B, 102, 4672] f32 priors = 487 MB at B=256;
samples stream via StreamingFinalizer. Metrics/log stream durably into
results/r4/ (log_dir), not gitignored runs/.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "chess_r4"
env = get_env("chess")
args = get_args(
    run_name=RUN,
    seed=11,
    numIters=12,
    numWarmupIters=1,
    process_batch_size=256,
    gamesPerIteration=512,
    numMCTSSims=100, numFastSims=20, probFastSim=0.75,
    cpuct=2.5, fpu_reduction=0.4,
    train_batch_size=512,
    arenaCompare=64, arenaCompareBaseline=64, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    symmetricSamples=False,  # chess has no board symmetry
    minTrainHistoryWindow=2, maxTrainHistoryWindow=6,
    log_dir="results/r4",
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
