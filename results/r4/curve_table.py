"""Render a run's metrics.jsonl as a markdown curve table.

Usage: python results/r4/curve_table.py results/r4/hnefatafl_r4/metrics.jsonl
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1]
rows = defaultdict(dict)
for line in open(path):
    r = json.loads(line)
    rows[int(r["step"])][r["tag"]] = r["value"]

cols = [
    ("win_rate/baseline", "vs RawMCTS"),
    ("win_rate/past", "vs past"),
    ("win_rate/self_play_model", "SP model"),
    ("loss/policy", "policy loss"),
    ("loss/value", "value loss"),
    ("train/effective_epochs", "eff. epochs"),
    ("win_rate/draws", "draw frac"),
    ("win_rate/avg_game_length", "avg len"),
    ("time/self_play", "selfplay s"),
    ("time/train", "train s"),
    ("time/arena_baseline", "arena_b s"),
    ("time/arena_past", "arena_p s"),
]
present = [(t, h) for t, h in cols if any(t in v for v in rows.values())]
print("| iter | " + " | ".join(h for _, h in present) + " |")
print("|" + "---|" * (len(present) + 1))
for it in sorted(rows):
    vals = []
    for t, _ in present:
        v = rows[it].get(t)
        vals.append("—" if v is None else
                    (f"{v:.3f}" if abs(v) < 100 else f"{v:.0f}"))
    print(f"| {it} | " + " | ".join(vals) + " |")
