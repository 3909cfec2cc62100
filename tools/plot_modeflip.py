"""Overlay the mode-flip control curves: the torch reference trainer vs the
links_tpu rebuild, both trained on the SAME synthetic pickle with the SAME
frozen flows (VERDICT r1 next #3 — "does torch flip too?").

Usage:
    python tools/plot_modeflip.py results/modeflip --out results/modeflip/overlay.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load(path: Path):
    """Epoch records, deduplicated (last record per epoch wins — the
    control runner appends on re-runs, like the trainers' JSONL logs)."""
    by_epoch = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                if "epoch" in r:
                    by_epoch[r["epoch"]] = r
    return [by_epoch[e] for e in sorted(by_epoch)]


def pa_mean(r):
    """Validation PA of a record, or None for train-only epochs (sparse
    validation under --validate-every N)."""
    if "pa_mean" in r:
        return r["pa_mean"]
    if "pa_left" in r and "pa_right" in r:
        return (r["pa_left"] + r["pa_right"]) / 2.0
    return None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("dir", help="dir holding {rebuild,reference}_curve.jsonl")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    d = Path(args.dir)
    rebuild = load(d / "rebuild_curve.jsonl")
    reference = load(d / "reference_curve.jsonl")
    out = args.out or str(d / "overlay.png")

    series = [(reference, "torch reference", "#d62728"),
              (rebuild, "links_tpu rebuild", "#1f77b4")]
    att_path = d / "attention_curve.jsonl"
    if att_path.exists():
        series.append((load(att_path), "links_tpu attention", "#2ca02c"))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    for rows, label, color in series:
        val = [r for r in rows if pa_mean(r) is not None]
        ax1.plot([r["epoch"] for r in val], [pa_mean(r) for r in val],
                 label=label, color=color)
        tr = [r for r in rows if "loss" in r]
        ax2.plot([r["epoch"] for r in tr], [r["loss"] for r in tr],
                 label=label, color=color)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("validation PA-MPJPE (mm)")
    ax1.set_title("Validation PA-MPJPE")
    ax1.legend()
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("training loss")
    ax2.set_title("Training loss")
    ax2.legend()
    fig.suptitle("Mode-flip control: same corpus, same frozen flows")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(out)

    # console summary for RESULTS.md
    for rows, name, _ in series:
        val = [r for r in rows if pa_mean(r) is not None]
        tr = [r for r in rows if "loss" in r]
        if not val or not tr:
            continue
        best = min(val, key=pa_mean)
        last = val[-1]
        print(f"{name}: best PA {pa_mean(best):.1f} @ ep{int(best['epoch'])}, "
              f"final PA {pa_mean(last):.1f} @ ep{int(last['epoch'])}, "
              f"loss {tr[0]['loss']:.1f} -> {tr[-1]['loss']:.1f}")


if __name__ == "__main__":
    main()
