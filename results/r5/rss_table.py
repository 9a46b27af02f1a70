"""Host-RSS + phase-timing table from a strength-run log (VERDICT r4
item 1 done-criterion: a >=10-iteration segment with flat host RSS after
the device-resident window removed the per-step host feed).

Parses the `[collect]` health lines plus the per-phase prints and emits a
per-iteration markdown table: RSS at self-play start/end, train seconds and
steps (s/step), samples. Compare results/r4/hnefatafl_r4.log (~+2.9 GB
RSS/iteration, watchdog restarts) with results/r5/hnefatafl_r5.log.
"""

import re
import sys


def main(path):
    it = None
    rows = {}
    for line in open(path):
        m = re.match(r"------ITER (\d+)------", line)
        if m:
            it = int(m.group(1))
            rows.setdefault(it, {})
            continue
        m = re.search(r"\[collect\].*rss_mb=(\d+).*jax_mb=(\d+)", line)
        if m and it is not None:
            r = rows[it]
            r.setdefault("rss_first", int(m.group(1)))
            r["rss_last"] = int(m.group(1))
            r["jax_mb"] = int(m.group(2))
            continue
        m = re.search(r"Saving (\d+) samples \((\d+) games, ([0-9.]+)s", line)
        if m and it is not None:
            rows[it]["samples"] = int(m.group(1))
            rows[it]["selfplay_s"] = float(m.group(3))
            continue
        m = re.search(r"Train iter \d+ (\d+)/(\d+) in ([0-9.]+)s", line)
        if m and it is not None:
            rows[it]["steps"] = int(m.group(1))
            rows[it]["train_s"] = float(m.group(3))

    print("| iter | rss start MB | rss end MB | jax MB | self-play s | "
          "train s | steps | s/step |")
    print("|---|---|---|---|---|---|---|---|")
    for it in sorted(rows):
        r = rows[it]
        if "rss_first" not in r:
            continue
        spst = (r["train_s"] / r["steps"]
                if r.get("steps") and r.get("train_s") else None)
        print(f"| {it} | {r.get('rss_first', '')} | {r.get('rss_last', '')} "
              f"| {r.get('jax_mb', '')} | {r.get('selfplay_s', '')} "
              f"| {r.get('train_s', '')} | {r.get('steps', '')} "
              f"| {f'{spst:.3f}' if spst else ''} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "results/r5/hnefatafl_r5.log")
