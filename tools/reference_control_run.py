"""Mode-flip control experiment (VERDICT r1 next #3): run the REFERENCE
trainer — its actual ``LitLifter.training_step`` / ``validation_step`` /
``configure_optimizers`` loaded via tests/_reference_shim.py, with its
natural torch RNG — on the same synthetic corpus and the same frozen flows
as a links_tpu stage-3a run, and log the per-epoch validation PA-MPJPE
curve to JSONL.

The question this answers: the rebuild's PA-MPJPE collapses to ~60 mm then
*regresses* into a depth-flipped mode late in training (RESULTS.md). Is
that flip inherent to the unsupervised objective, or a rebuild numerics
bug? If the torch reference flips on the same data, it is the objective.

Confound control:
* identical data arrays — both sides read the pickle through the
  links_tpu loader (itself differentially tested against the reference
  dataset classes, tests/test_reference_parity.py);
* identical frozen flows — the rebuild's stage-1/2 flows exported through
  ckpt.flow_to_torch into the FlowSeq adapter (forward/logdet parity-tested
  at tests/test_reference_parity.py:494-521);
* identical hyperparameters — the reference module's own config block
  (lr 2e-4, wd 1e-5, γ=0.95/epoch, batch 256, default loss weights) plus
  the corpus-derived bone means both runs use (--bone-means data).

Usage (see tools/run_modeflip_control.sh for the full recipe):
    python tools/reference_control_run.py --data <synth.pkl> \
        --model-dir <dir with flow .pt exports> --epochs 40 \
        --out results/modeflip/reference_curve.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# this is a torch-CPU run; the links_tpu imports below pull in jax, which
# must not grab the (single, possibly busy) TPU chip for its eager ops
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="synthetic reference-schema pickle")
    ap.add_argument("--model-dir", required=True,
                    help="dir holding full_flow.pt / flow_left.pt / "
                         "flow_right.pt exports of the rebuild's flows")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--val-n", type=int, default=2048,
                    help="validation poses per epoch (reference numpy "
                         "Procrustes loop is per-sample)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="JSONL curve output")
    args = ap.parse_args(argv)

    # data through the links_tpu loader (identical arrays to the jax run)
    from links_tpu.cli import _common as C

    class _A:  # minimal args shim for load_train_test
        data = args.data
        dataset = "h36m"
        train_subjects = test_subjects = None
        test_norm = None
        test_scale = "auto"
        gt_2d = True
        synthetic = False

    train_data, test_data = C.load_train_test(_A())
    train2d = np.asarray(train_data.poses_2d)
    test2d = np.asarray(test_data.poses_2d)[: args.val_n]
    test3d = np.asarray(test_data.poses_3d)[: args.val_n]
    bone_means = np.asarray(C.bone_means_from_data(train_data))

    from tests._reference_shim import load_trainer_module
    from tests.test_reference_parity import _INN

    mod = load_trainer_module("train_left_right_lifter.py", r"^left_inn2d = ")
    # undefined Attention_Left_Right_Lifter → the MLP lifter the shipped
    # weights use (SURVEY.md §7.3)
    mod.Attention_Left_Right_Lifter = (
        lambda **kw: mod.Left_Right_Lifter(
            use_batchnorm=False, num_joints=kw.get("num_joints", 11),
            use_dropout=False)
    )

    def _load_inn(dim, name):
        sd = torch.load(Path(args.model_dir) / name, map_location="cpu")
        return _INN(dim, {k: v.numpy() for k, v in sd.items()})

    torch.manual_seed(args.seed)  # reference: torch.manual_seed(42) (:12)
    lit = mod.LitLifter(
        _load_inn(22, "flow_left.pt"),
        _load_inn(22, "flow_right.pt"),
        _load_inn(34, "full_flow.pt"),
    )
    lit.bone_relations_mean = torch.tensor(bone_means, dtype=torch.float32)
    opts, scheds = lit.configure_optimizers()
    lit._test_optimizers = opts
    lit._test_schedulers = scheds

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n = train2d.shape[0]
    steps_per_epoch = n // args.batch_size
    print(f"[control] {n} train poses, {steps_per_epoch} steps/epoch, "
          f"{args.epochs} epochs, val_n={len(test3d)}", flush=True)

    with open(out, "a") as f:
        f.write(json.dumps({"_config": {
            "what": "reference trainer (shim-executed) on synthetic corpus",
            "epochs": args.epochs, "batch_size": args.batch_size,
            "seed": args.seed, "val_n": int(len(test3d)),
            "torch": torch.__version__}}) + "\n")
        for epoch in range(args.epochs):
            t0 = time.time()
            perm = rng.permutation(n)[: steps_per_epoch * args.batch_size]
            losses = []
            for i in range(steps_per_epoch):
                idx = perm[i * args.batch_size:(i + 1) * args.batch_size]
                batch = torch.tensor(train2d[idx])
                lit.training_step({"p2d_gt": batch}, i)
                losses.append(float(lit.losses.loss.detach()))
            scheds[0].step()
            scheds[1].step()
            lit.current_epoch = epoch
            with torch.no_grad():
                lit.validation_step({"p2d_gt": torch.tensor(test2d),
                                     "poses_3d": torch.tensor(test3d)}, 0)
            rec = {
                "epoch": epoch,
                "loss": float(np.mean(losses)),
                "pa_left": float(lit.losses.pa_left),
                "pa_right": float(lit.losses.pa_right),
                "pa_mean": float((lit.losses.pa_left + lit.losses.pa_right) / 2),
                "mpjpe_scaled_left": float(lit.losses.mpjpe_scaled_left),
                "seconds": round(time.time() - t0, 1),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(f"[control] epoch {epoch}: loss={rec['loss']:.2f} "
                  f"pa_mean={rec['pa_mean']:.2f} ({rec['seconds']}s)",
                  flush=True)


if __name__ == "__main__":
    main()
