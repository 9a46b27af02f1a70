"""Brandubh ablation grid (VERDICT r3 items 2 and 6): attribute the r3
hnefatafl flat curve to search budget vs train budget, and A/B int8
self-play strength on a tafl action space.

Arms (run: ``python results/r4/brandubh_ablation.py <arm>``):

  sweep axis 1 — search budget:  100/20 sims  vs  250/50 sims
  sweep axis 2 — train budget:   capped (~0.2 effective epochs, the r3
                 hnefatafl condition: 600 steps x 1024 over ~3M-unit
                 windows => samples_seen/window ~ 0.2) vs epoch-matched
                 (autoTrainSteps, the reference's Coach.py:475-477 policy)

  arm a_lowsims_capped   : 100/20, capped     (the r3 hnefatafl condition)
  arm b_lowsims_epoch    : 100/20, autoTrainSteps  (the r1 brandubh recipe)
  arm c_hisims_capped    : 250/50, capped
  arm d_hisims_epoch     : 250/50, autoTrainSteps  (the reference recipe)
  arm b_bf16             : arm b with quant_selfplay=False — the int8
                           strength A/B at tafl scale (VERDICT r3 item 6;
                           the connect4 A/B is results/README.md)

Everything else matches the proven r1 brandubh recipe
(results/brandubh_r1_config.py): 2048 games/iteration at B=1024, 64ch x 6,
cpuct 4.0 / fpu 0.4, 128-game arenas, 12 iterations (r1 curves separate
from baseline by iteration ~8-12).

The capped arms reproduce the r3 hnefatafl coverage ratio: brandubh emits
~160k training units/iteration (2048 games x ~40 moves x 25% full x 8
symmetries), so 32 steps x 1024 = 33k samples seen ~ 0.2 epochs.
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

ARMS = {
    "a_lowsims_capped": dict(numMCTSSims=100, numFastSims=20,
                             autoTrainSteps=False,
                             train_steps_per_iteration=32),
    "b_lowsims_epoch": dict(numMCTSSims=100, numFastSims=20,
                            autoTrainSteps=True),
    "c_hisims_capped": dict(numMCTSSims=250, numFastSims=50,
                            autoTrainSteps=False,
                            train_steps_per_iteration=32),
    "d_hisims_epoch": dict(numMCTSSims=250, numFastSims=50,
                           autoTrainSteps=True),
    "b_bf16": dict(numMCTSSims=100, numFastSims=20, autoTrainSteps=True,
                   quant_selfplay=False),
}

arm = sys.argv[1]
env = get_env("brandubh")
args = get_args(
    run_name=f"brandubh_abl_{arm}",
    seed=23,
    numIters=int(os.environ.get("ABL_ITERS", "12")),
    numWarmupIters=1,
    process_batch_size=1024,
    gamesPerIteration=2048,
    probFastSim=0.75,
    cpuct=4.0, fpu_reduction=0.4,
    train_batch_size=1024,
    arenaCompare=128, arenaCompareBaseline=128, arenaTemp=0.25,
    num_channels=64, depth=6,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[512, 128], policy_dense_layers=[512],
    lr=0.01,
    minTrainHistoryWindow=4, maxTrainHistoryWindow=16,
    log_dir="results/r5",
    **ARMS[arm],
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"ARM {arm} DONE wallclock_s={time.time() - t0:.1f}")
