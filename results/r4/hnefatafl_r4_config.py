"""Round-4 hnefatafl 11x11 strength run — the REFERENCE'S OWN recipe
(VERDICT r3 item 1).

Every search/train/arena knob below mirrors the reference's named entry
`/root/reference/alphazero/envs/hnefatafl/train_fastafl.py:11-59`:
250/50 sims at probFastSim=0.8, numWarmupSims=5, cpuct=1.25 (the r3 run's
cpuct=4.0/fpu=0.4 deviation is dropped), 512 games/iteration, 128ch x
depth-10 ResNet with 32-channel heads and [4096,128]/[4096] dense stacks,
SGD lr=1e-2 momentum=0.9 weight_decay=1e-3, MultiStep milestones [75,150],
model gating at 0.52 with 128-game past/baseline arenas every iteration,
max_moves=512 (the env's draw_move_count, envs/tafl.py:597).

Affordability over the r3 recipe comes from round-4 machinery, not budget
cuts: the rank-walk Pallas descent (A-independent), int8 self-play
inference, and device-side train-step symmetries + prefetch feed
(NNetWrapper.set_device_symmetries) so autoTrainSteps' ~1 epoch over the
latest iteration's expanded samples is paid at ~raw-row cost.

Divergences from the reference entry (each deliberate, none a budget cut):
- train_steps_per_iteration=80 in the reference file is DEAD config — its
  autoTrainSteps default (Coach.py:37, 475-477) overrides it; we run the
  same autoTrainSteps accounting explicitly.
- maxWindowSamples caps the resident window (this-repo knob; the reference
  loads its whole window and OOMs at this scale on this host).
- metrics/log stream into results/r4/ (durable), not gitignored runs/.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

RUN = "hnefatafl_r4"
env = get_env("hnefatafl")
args = get_args(
    run_name=RUN,
    seed=7,
    numIters=40,                      # wall-clock bounded; ckpts stream
    numWarmupIters=1,
    numWarmupSims=5,
    process_batch_size=512,
    gamesPerIteration=512,            # reference: 128 * 4
    numMCTSSims=250, numFastSims=50, probFastSim=0.8,
    cpuct=1.25,                       # reference default + entry value
    fpu_reduction=0.2,
    train_batch_size=2048,
    autoTrainSteps=True,              # ~1 epoch over latest iter's samples
    maxWindowSamples=12_000_000,      # training units; raw rows = /8
    arenaCompare=128, arenaCompareBaseline=128, arenaTemp=0.25,
    arenaHostLoop=True,  # fused whole-game arena crashes the TPU worker at
                         # 250 sims x 128ch x 10 (see selfplay/arena.py)
    min_next_model_winrate=0.52,
    num_channels=128, depth=10,
    value_head_channels=32, policy_head_channels=32,
    value_dense_layers=[4096, 128], policy_dense_layers=[4096],
    lr=0.01,
    optimizer_args=dict(momentum=0.9, weight_decay=1e-3),
    scheduler_args=dict(milestones=[75, 150], gamma=0.1),
    minTrainHistoryWindow=4, maxTrainHistoryWindow=20,
    log_dir="results/r4",
)
net = NNetWrapper(env, args)
t0 = time.time()
Coach(env, net, args).learn()
print(f"TRAINING DONE wallclock_s={time.time() - t0:.1f}")
