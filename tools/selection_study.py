"""Unsupervised-vs-GT checkpoint selection study (VERDICT r2 next #8).

Reads a lifter-stage JSONL curve (which, since round 3, logs per
validation epoch BOTH the GT criterion — pa_mean / pa — and the
unsupervised criteria val_nll / val_unsup_loss) and reports, per curve:

  * the epoch + PA each criterion would have selected;
  * the PA cost of unsupervised selection vs GT selection (mm).

If selecting on val_nll lands within a few mm of GT-PA selection, the
pipeline is end-to-end unsupervised including model selection
(--select-by nll); RESULTS.md carries the table.

Usage:
    python tools/selection_study.py results/r3/*.jsonl runs/r3/models_gt/left_right_lifter.jsonl
"""

from __future__ import annotations

import json
import os
import sys


def study(path: str):
    rows = []
    if not os.path.exists(path):
        print(f"[selection_study] skipping missing curve {path}",
              file=sys.stderr)
        return None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "_config" in rec:
                rows = []  # the logger appends across restarts: a fresh
                continue   # config line starts a new run — keep the last
            pa = rec.get("pa_mean", rec.get("pa"))
            if pa is None or "val_nll" not in rec:
                continue
            tilt = rec.get("val_tilt")
            rows.append((int(rec["epoch"]), float(pa),
                         float(rec["val_nll"]),
                         float(rec["val_unsup_loss"]),
                         None if tilt is None else float(tilt)))
    if not rows:
        return None
    by_pa = min(rows, key=lambda r: r[1])
    by_nll = min(rows, key=lambda r: r[2])
    by_loss = min(rows, key=lambda r: r[3])
    out = {
        "curve": path,
        "epochs": len(rows),
        "gt_pa_select": {"epoch": by_pa[0], "pa": round(by_pa[1], 2)},
        "nll_select": {"epoch": by_nll[0], "pa": round(by_nll[1], 2),
                       "pa_cost_mm": round(by_nll[1] - by_pa[1], 2)},
        "unsup_loss_select": {"epoch": by_loss[0], "pa": round(by_loss[1], 2),
                              "pa_cost_mm": round(by_loss[1] - by_pa[1], 2)},
        "final_epoch_pa": round(rows[-1][1], 2),
    }
    # flip diagnostics (VERDICT r4 next #1): does this curve end in the
    # depth-flipped mode (PA well above the best epoch), and does the
    # unsupervised tilt alarm actually read positive over that final
    # flipped segment — i.e. would the nll-tilt gate have seen it?
    flipped = rows[-1][1] - by_pa[1] > 15.0
    out["flipped_at_end"] = flipped
    if rows[-1][4] is not None:
        out["final_epoch_tilt"] = round(rows[-1][4], 4)
        if flipped:
            # the contiguous final segment with PA >15mm above best
            seg = []
            for r in reversed(rows):
                if r[1] - by_pa[1] > 15.0:
                    seg.append(r)
                else:
                    break
            pos = sum(1 for r in seg if r[4] is not None and r[4] >= 0.0)
            out["flipped_segment"] = {
                "epochs": len(seg),
                "tilt_positive": pos,
                "tilt_agreement": round(pos / len(seg), 3) if seg else None,
            }
    # nll-tilt (VERDICT r3 next #3): NLL restricted to epochs whose
    # depth-flip alarm is negative (metrics.depth_tilt_score — the
    # un-flipped mode). Curves from before round 4 don't log val_tilt.
    if any(r[4] is not None for r in rows):
        unflipped = [r for r in rows if r[4] is not None and r[4] < 0.0]
        if unflipped:
            by_nt = min(unflipped, key=lambda r: r[2])
            out["nll_tilt_select"] = {
                "epoch": by_nt[0], "pa": round(by_nt[1], 2),
                "pa_cost_mm": round(by_nt[1] - by_pa[1], 2),
                "epochs_vetoed": len(rows) - len(unflipped),
            }
        else:
            out["nll_tilt_select"] = {"no_unflipped_epoch": True,
                                      "epochs_vetoed": len(rows)}
    else:
        out["nll_tilt_select"] = "val_tilt not logged (pre-round-4 curve)"
    return out


def main():
    out = [r for p in sys.argv[1:] if (r := study(p)) is not None]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
