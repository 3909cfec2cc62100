"""Profile the stage-3a validation path + epoch step on the real chip,
mimicking the CLI exactly (corpus + frozen flows from a training dir).

Usage: python tools/profile_validate.py [--data runs/r4/corpus.pkl]
       [--model-dir runs/r4/models_gt]

Round-5 findings on the tunneled v5e (PERF.md "Delivered vs benched"):
  lift fwd 16k:    38 ms        _validate:        167 ms
  pa_mpjpe 16k:    90 ms        _validate_unsup:   50 ms
  n_mpjpe 16k:     30 ms        device_get(dict): 2.5 ms
  tilt 16k:        32 ms
The round-4 report's 3 s/epoch "validate" term was the two validation
programs' one-time jit compiles amortized over 100 epochs, not a steady
cost — steady validation is ~0.2 s/epoch (~3% of the 8.4 s step).
"""
import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/links_tpu/xla"))
import jax
import jax.numpy as jnp

from links_tpu import metrics, models
from links_tpu.cli import _common as C
from links_tpu.cli.train_left_right_lifter import _validate, _validate_unsup
from links_tpu.config import LifterTrainConfig
from links_tpu.objectives import LifterFrozen, lift_left_right_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="runs/r4/corpus.pkl")
    p.add_argument("--model-dir", default="runs/r4/models_gt")
    a = p.parse_args()

    class A:
        pass

    args = A()
    args.data = a.data
    args.dataset = "h36m"
    args.train_subjects = args.test_subjects = args.test_norm = None
    args.test_scale = "auto"
    args.synthetic = False
    args.seed = 42
    args.gt_2d = True
    args.keep_incomplete = False
    args.model_dir = a.model_dir
    args.packed_data = args.num_devices = None

    train_data, test_data = C.load_train_test(args)
    cfg = LifterTrainConfig()
    frozen = LifterFrozen(full_flow=C.load_flow(args, C.FULL_FLOW),
                          part_a=C.load_flow(args, C.FLOW_LEFT),
                          part_b=C.load_flow(args, C.FLOW_RIGHT))
    kl, kr = jax.random.split(jax.random.PRNGKey(42))
    stacked = jax.tree.map(lambda x, y: jnp.stack([x, y]),
                           models.init_lifter(kl, models.SIDE_JOINTS),
                           models.init_lifter(kr, models.SIDE_JOINTS))
    test2d, test3d = test_data.poses_2d, test_data.poses_3d
    bone_means = C.bone_means_from_data(train_data)
    val_key = jax.random.PRNGKey(62)

    def sync(out):
        # true sync on the tunneled device: fetch a scalar reduced from
        # the outputs (block_until_ready alone hides transfer latency)
        leaves = jax.tree.leaves(out)
        jax.device_get(jnp.asarray(0.0) + sum(jnp.sum(l) for l in leaves))

    def timeit(name, fn, n=3):
        sync(fn())  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn())
        print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms")

    lift_l = jax.jit(lambda p, t: lift_left_right_eval(p, t, 10.0, "left"))
    timeit("lift fwd", lambda: lift_l(stacked, test2d))
    pred = lift_l(stacked, test2d)
    sync(pred)
    pa = jax.jit(metrics.pa_mpjpe)
    timeit("pa_mpjpe", lambda: pa(test3d, pred))
    nm = jax.jit(lambda x, y: metrics.n_mpjpe(x, y, num_joints=17,
                                              root_joint=0))
    timeit("n_mpjpe", lambda: nm(test3d, pred))
    tl = jax.jit(metrics.depth_tilt_score)
    timeit("depth_tilt", lambda: tl(pred))
    timeit("_validate", lambda: _validate(stacked, test2d, test3d))
    timeit("_validate_unsup",
           lambda: _validate_unsup(stacked, frozen, bone_means, test2d,
                                   val_key, cfg))
    o = _validate(stacked, test2d, test3d)
    sync(o)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(o)
    print(f"device_get(small dict): "
          f"{(time.perf_counter() - t0) / 10 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
