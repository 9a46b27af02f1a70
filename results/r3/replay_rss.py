"""Peak-RSS A/B for the round-3 streaming replay finalize (VERDICT r2
item 4): synthesize an hnefatafl-scale iteration's worth of self-play
rounds (B=512, obs 5x11x11 f16, pi A=2420 f16, 25% full rounds, ~90-move
episodes) and drive them through (a) the old one-shot accumulate-then-
finalize_sparse path and (b) the StreamingFinalizer + part-file writer, in
separate subprocesses, recording ru_maxrss. Host-side only (no device),
CPU-forced — isolates exactly the memory the Coach collection loop holds.

Run: python results/r3/replay_rss.py
"""
import json
import os
import subprocess
import sys

K = int(os.environ.get("RSS_ROUNDS", 1200))
B = int(os.environ.get("RSS_BATCH", 512))

WORKER = r"""
import os, resource, sys, tempfile
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

mode = sys.argv[1]
K, B = int(sys.argv[2]), int(sys.argv[3])
OBS = (5, 11, 11)
A = 2420
V = 3
rng = np.random.default_rng(0)

class Env:  # symmetry expansion off: isolate the accumulate/finalize memory
    NUM_SYMMETRIES = 1
    NAME = "rss_probe"

def rounds():
    done_clock = rng.integers(0, 90, B)
    for t in range(K):
        done = done_clock == 0
        done_clock = np.where(done, rng.integers(60, 120, B), done_clock - 1)
        win = np.zeros((B, V), np.float32)
        win[done, rng.integers(0, 2)] = 1.0
        fast = (t % 4) != 3
        obs = None if fast else rng.random((B,) + OBS, np.float32).astype(np.float16)
        pi = None if fast else rng.random((B, A), np.float32).astype(np.float16)
        yield win, done, fast, obs, pi

out_dir = tempfile.mkdtemp()
if mode == "stream":
    from alphazero_general_tpu.selfplay.replay import (
        StreamingFinalizer, ReplayStore)
    store = ReplayStore(out_dir, "probe")
    w = store.writer(1, OBS, A, V)
    fin = StreamingFinalizer(Env, False, w.append)
    for win, done, fast, obs, pi in rounds():
        fin.add_round(win, done, fast, obs=obs, pi=pi)
    n = fin.finish(); w.close()
else:
    from alphazero_general_tpu.selfplay.replay import finalize_sparse
    metaw, metad, fasts, obss, pis, idx = [], [], [], [], [], []
    for t, (win, done, fast, obs, pi) in enumerate(rounds()):
        metaw.append(win); metad.append(done); fasts.append(fast)
        if obs is not None:
            idx.append(t); obss.append(obs); pis.append(pi)
    o, p, v = finalize_sparse(
        np.stack(metaw), np.stack(metad), np.asarray(fasts),
        np.stack(obss), np.stack(pis), np.asarray(idx),
        symmetric=False, env=Env)
    np.savez_compressed(os.path.join(out_dir, "oneshot.npz"),
                        obs=o, pi=p, value=v)
    n = len(o)
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(f"{mode} samples={n} peak_rss_mb={peak_mb:.0f}")
"""

results = {}
for mode in ("oneshot", "stream"):
    r = subprocess.run([sys.executable, "-c", WORKER, mode, str(K), str(B)],
                       capture_output=True, text=True)
    line = [ln for ln in r.stdout.splitlines() if "peak_rss_mb" in ln]
    print(line[0] if line else r.stderr[-2000:])
    if line:
        results[mode] = line[0]
with open(os.path.join(os.path.dirname(__file__), "replay_rss.json"),
          "w") as f:
    json.dump({"rounds": K, "batch": B, **results}, f, indent=1)
