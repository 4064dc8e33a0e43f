#!/usr/bin/env python3
"""Plot training curves from train_ppo.py / sweep_ppo.py jsonl logs.

The reference fork's experiments/ utilities end at CSV dumps; here the
training scripts emit one JSON object per logged iteration, and this
tool turns one or more such logs into a comparison figure (mean reward,
done fraction and, when present, goal fraction per iteration).

  python scripts/plot_training.py docs/train_rgb_small_loop_r4_defaults.log \
      [more.log ...] -o /tmp/curves.png [--label A --label B ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def parse_log(path):
    """[(iter, metrics dict)] from a train_ppo jsonl log (non-JSON and
    non-iteration lines are skipped)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "iter" in d and "mean_reward" in d:
                rows.append((int(d["iter"]), d))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("-o", "--out", default="training_curves.png")
    ap.add_argument("--label", action="append", default=None,
                    help="one per log (default: file stem)")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = [(lbl or os.path.splitext(os.path.basename(p))[0], parse_log(p))
            for p, lbl in zip(
                args.logs,
                (args.label or [None] * len(args.logs)))]
    runs = [(lbl, rows) for lbl, rows in runs if rows]
    if not runs:
        sys.exit("no iteration rows found in any log")

    keys = ["mean_reward", "done_frac"]
    if any("goal_frac" in d for _, rows in runs for _, d in rows):
        keys.append("goal_frac")
    fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 3.4))
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        for lbl, rows in runs:
            xs = [i for i, d in rows if key in d]
            ys = [d[key] for _, d in rows if key in d]
            if xs:
                ax.plot(xs, ys, label=lbl, linewidth=1.4)
        ax.set_xlabel("iteration")
        ax.set_title(key)
        ax.grid(True, alpha=0.3)
        if key != "mean_reward":
            ax.set_yscale("symlog", linthresh=1e-4)
    axes[0].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out} ({', '.join(lbl for lbl, _ in runs)})")


if __name__ == "__main__":
    main()
