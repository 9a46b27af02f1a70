"""Offline gating-rule A/B (VERDICT r4 item 2, first half).

Replays the ARCHIVED round-4 past-arena outcomes (results/r4/*.log) through
both gate decision rules — the reference's half-credit-draw winrate
(reference: alphazero/Coach.py:558-572) and the "decided" rule
(wins_new / decided >= threshold with a minimum decided-game count,
train/coach.py compare_to_past) — and prints the per-iteration decision
table that results/r5/gating_ab.md archives. No chip time needed: the arena
games were already played; the rules differ only in how they score them.
"""

import re
import sys

THRESH = 0.52
MIN_DECIDED = 16


def parse(log_path):
    """Yield (iteration, wins_new, wins_old, draws) for each past arena."""
    it = None
    rows = []
    for line in open(log_path):
        m = re.match(r"------ITER (\d+)------", line)
        if m:
            it = int(m.group(1))
        m = re.match(r"NEW/PAST WINS : (\d+) / (\d+) ; DRAWS : (\d+)", line)
        if m:
            rows.append((it, int(m.group(1)), int(m.group(2)),
                         int(m.group(3))))
    return rows


def table(log_path, name):
    rows = parse(log_path)
    print(f"\n## {name}\n")
    print("| iter | W | L | D | draw% | ref wr | ref | decided wr | decided |"
          " agree |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    n_promote_ref = n_promote_dec = 0
    for it, w, l, d in rows:
        total = w + l + d
        ref = (w + 0.5 * d) / total
        decided = w + l
        dec = w / max(decided, 1)
        p_ref = ref >= THRESH
        p_dec = decided >= MIN_DECIDED and dec >= THRESH
        n_promote_ref += p_ref
        n_promote_dec += p_dec
        print(f"| {it} | {w} | {l} | {d} | {100 * d / total:.0f}% "
              f"| {ref:.3f} | {'PROMOTE' if p_ref else 'keep'} "
              f"| {dec:.3f} | {'PROMOTE' if p_dec else 'keep'} "
              f"| {'yes' if p_ref == p_dec else 'NO'} |")
    print(f"\npromotions: reference {n_promote_ref}, decided {n_promote_dec} "
          f"of {len(rows)} gates")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "results/r4"
    table(f"{base}/hnefatafl_r4.log", "hnefatafl r4 (128-game arenas, "
          "512-move draw cap)")
    table(f"{base}/chess_r4.log", "chess r4 (64-game arenas)")
