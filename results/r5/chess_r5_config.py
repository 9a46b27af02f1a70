"""Round-5 chess gated run: 12 iterations of the r4 recipe, restarted.

The r4 run reached 5 of the ordered 8-12 iterations (vs-RawMCTS 0.172 →
0.336, rising; zero promotions) before its checkpoints were lost with the
container — this fresh run targets the full 12. The gating A/B
(results/r5/gating_ab.md) shows r4's zero promotions were NOT a gate
artifact: the model lost decided games 4:46..10:32 vs iteration 0 while
still climbing vs RawMCTS, so the blocker is strength at 100 sims and the
fix is more iterations. gatingRule="decided" rides along (same decisions on
all archived evidence; robust if the draw fraction ever climbs).

deviceWindow is OFF for chess by design: a chess row is ~22 KB
(obs 102x8x8 f16 + dense pi 4672 f16), so the ~1M-row host window that fits
comfortably in host RAM would need ~21 GB of HBM. The device window targets
the symmetric board envs whose raw rows are ~6 KB (tafl, connect4); chess
keeps the proven host feed + watchdog runner.

Reference counterpart: none — the reference's chess env is a dead stub
(reference: alphazero/envs/chess/chess.py:82-92).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "chess_r5"
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
    min_next_model_winrate=0.52,
    gatingRule="decided",
    # Warmup lock-in guard (see hnefatafl_r5_config.py and
    # results/r5/README.md): in r4 chess NEVER exited warmup — every
    # iteration's samples were warmup-sized (~160k, no fast-sim discard),
    # i.e. the whole run trained on uniform-random 5-sim play, which is
    # why it stayed below 0.5 vs everything. The reference's
    # max_gating_iters escape hatch ends warmup after 2 failed gates.
    max_gating_iters=2,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    symmetricSamples=False,  # chess has no board symmetry
    deviceWindow=False,      # see module docstring
    minTrainHistoryWindow=2, maxTrainHistoryWindow=6,
    log_dir="results/r5",
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
