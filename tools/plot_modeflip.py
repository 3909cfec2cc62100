"""Overlay the rebuild's and the reference's stage-3a validation-PA curves
from the mode-flip control experiment (tools/run_modeflip_control.sh) into
one figure + a small markdown summary.

Usage:
    python tools/plot_modeflip.py results/modeflip --out results/modeflip/modeflip_control.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# categorical slots 1/2 (identity encoding; fixed order, not cycled)
C_REBUILD = "#2a78d6"
C_REFERENCE = "#eb6834"


def load_curve(path: Path):
    epochs, pa = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if "epoch" not in r:
                continue
            if "pa_mean" in r:
                epochs.append(r["epoch"])
                pa.append(r["pa_mean"])
            elif "pa_left" in r and "pa_right" in r:
                epochs.append(r["epoch"])
                pa.append((r["pa_left"] + r["pa_right"]) / 2)
    return epochs, pa


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("curve_dir", type=Path,
                    help="dir with rebuild_curve.jsonl + reference_curve.jsonl")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)
    out = args.out or args.curve_dir / "modeflip_control.png"

    series = []
    for name, label, color in (
            ("rebuild_curve.jsonl", "links_tpu (jax, TPU)", C_REBUILD),
            ("reference_curve.jsonl", "reference (torch, CPU)", C_REFERENCE)):
        p = args.curve_dir / name
        if p.exists():
            e, pa = load_curve(p)
            if e:
                series.append((label, color, e, pa))

    fig, ax = plt.subplots(figsize=(8, 4.5))
    for label, color, e, pa in series:
        ax.plot(e, pa, color=color, linewidth=2, label=label)
        i_best = min(range(len(pa)), key=pa.__getitem__)
        ax.scatter([e[i_best]], [pa[i_best]], color=color, s=28, zorder=3)
        ax.annotate(f"best {pa[i_best]:.1f} @ ep {e[i_best]}",
                    (e[i_best], pa[i_best]), textcoords="offset points",
                    xytext=(6, -12), fontsize=8, color="#444444")
    ax.set_xlabel("epoch")
    ax.set_ylabel("validation PA-MPJPE (mm)")
    ax.set_title("Stage-3a mode-flip control: same corpus, same frozen flows")
    ax.grid(True, color="#e6e6e6", linewidth=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    if len(series) >= 2:
        ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")

    md = out.with_suffix(".md")
    with open(md, "w") as f:
        f.write("| trainer | best PA (epoch) | final PA (epoch) |\n|---|---|---|\n")
        for label, _, e, pa in series:
            i = min(range(len(pa)), key=pa.__getitem__)
            f.write(f"| {label} | {pa[i]:.1f} (ep {e[i]}) | "
                    f"{pa[-1]:.1f} (ep {e[-1]}) |\n")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
