"""Render training-curve PNGs + a markdown summary table from the per-stage
JSONL metric logs a pipeline run leaves in <model-dir>/*.jsonl.

Usage:
    python tools/plot_curves.py runs/conv/models --out results/curves
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# stage jsonl name -> (title, [(key, label)]) for the loss panel
STAGES = {
    "full_pose_norm_flow": ("Stage 1: full-pose flow NLL", [("loss", "NLL (real+sample)")]),
    "part_norm_flows": ("Stage 2: part flows NLL", [("loss", "summed NLL")]),
    "left_right_lifter": ("Stage 3a: left/right lifters", [("loss", "total loss")]),
    "leg_torso_lifter": ("Stage 3b: leg/torso lifters", [("loss", "total loss")]),
    "occlusion_models": ("Stage 4: occlusion completers", [("loss", "summed MSE")]),
}
PA_KEYS = ("pa_left", "pa_right", "pa", "pa_legs_torso")


def load(path: Path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir", type=Path)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)
    out = args.out or args.model_dir.parent / "curves"
    out.mkdir(parents=True, exist_ok=True)

    summary = []
    for name, (title, loss_keys) in STAGES.items():
        p = args.model_dir / f"{name}.jsonl"
        if not p.exists():
            continue
        rows = [r for r in load(p) if "loss" in r]  # drop _config headers
        if not rows:
            continue
        # resumed runs append overlapping epochs (MetricLogger mode 'a');
        # keep the last record per epoch, in epoch order. All trainers write
        # an 'epoch' key; a row without one would otherwise collide with a
        # real epoch number and silently drop it (ADVICE r1)
        rows = [r for r in rows if "epoch" in r]
        if not rows:
            continue
        by_epoch = {r["epoch"]: r for r in rows}
        rows = [by_epoch[e] for e in sorted(by_epoch)]
        epochs = [r["epoch"] for r in rows]

        def series(key):
            """(epochs, values) of the rows that contain ``key`` — validation
            metrics are sparse under --validate-every N."""
            pts = [(e, r[key]) for e, r in zip(epochs, rows) if key in r]
            return [p[0] for p in pts], [p[1] for p in pts]

        pa_cols = [k for k in PA_KEYS if k in rows[-1]]
        ncols = 2 if pa_cols else 1
        fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 4))
        axes = [axes] if ncols == 1 else list(axes)
        for key, label in loss_keys:
            if key in rows[0]:
                axes[0].plot(*series(key), label=label)
        axes[0].set_title(title)
        axes[0].set_xlabel("epoch")
        axes[0].legend()
        if pa_cols:
            for k in pa_cols:
                axes[1].plot(*series(k), label=k)
            for k in ("mpjpe_scaled_left", "mpjpe_scaled", "n_mpjpe"):
                if k in rows[-1]:
                    axes[1].plot(*series(k), "--", label=k)
            axes[1].set_title("eval error (mm)")
            axes[1].set_xlabel("epoch")
            axes[1].legend()
        fig.tight_layout()
        fig.savefig(out / f"{name}.png", dpi=110)
        plt.close(fig)

        first, last = rows[0], rows[-1]
        row = {"stage": name, "epochs": len(rows),
               "loss_first": round(first.get("loss", float("nan")), 3),
               "loss_last": round(last.get("loss", float("nan")), 3)}
        for k in pa_cols:
            firsts = [r[k] for r in rows if k in r]
            row[f"{k}_first"] = round(firsts[0], 2)
            row[f"{k}_best"] = round(min(firsts), 2)
            row[f"{k}_last"] = round(firsts[-1], 2)
        summary.append(row)

    md = ["| stage | epochs | loss first→last | PA-MPJPE first→best→last |",
          "|---|---|---|---|"]
    for r in summary:
        pa = ""
        for k in PA_KEYS:
            if f"{k}_first" in r:
                pa += (f"{k}: {r[f'{k}_first']}→{r[f'{k}_best']}"
                       f"→{r[f'{k}_last']} ")
        md.append(f"| {r['stage']} | {r['epochs']} | "
                  f"{r['loss_first']} → {r['loss_last']} | {pa or '—'} |")
    (out / "summary.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
