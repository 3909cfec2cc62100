"""Import shim that loads the *actual* reference modules from
/root/reference for differential parity testing (VERDICT.md round-1 item 1).

The reference is a read-only torch codebase with broken package roots
(`AAAI_Code.`, `lift_and_fill_models.` — SURVEY.md §7.3), a hard-coded
`.cuda()` call (utils/helpers.py:168) and a stray `pytorch_lightning`
import (utils/models_def.py:2, never used). This module:

  * no-ops ``torch.Tensor.cuda`` so the CPU torch build can execute the
    reference code unchanged;
  * registers an empty ``pytorch_lightning`` stub;
  * registers ``AAAI_Code.utils.helpers`` / ``lift_and_fill_models.utils.*``
    aliases pointing at the loaded reference helpers so the dataset classes
    import;
  * loads helpers / metrics / metrics_batch / models_def /
    rotation_conversions / h36m_dataset_class directly from file.

Nothing here copies reference code — it executes it in place so tests can
assert elementwise agreement with the rebuild.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"

_loaded: dict[str, types.ModuleType] = {}


def _load_file(name: str, path: str) -> types.ModuleType:
    if name in _loaded:
        return _loaded[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[name] = mod
    return mod


def _install_stubs():
    import torch

    # utils/helpers.py:168 calls .cuda() on a fresh tensor; the trainer
    # classes call .cuda() on modules (train_left_right_lifter.py:67-68).
    # Make both no-ops for the CPU torch build.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = object  # only imported, never used by utils
        sys.modules["pytorch_lightning"] = pl


class _WandbConfig:
    """Attribute-assignable stand-in for wandb.config."""

    def update(self, other, **kw):
        src = vars(other) if not isinstance(other, dict) else other
        self.__dict__.update(src)


def _wandb_stub() -> types.ModuleType:
    wandb = types.ModuleType("wandb")
    wandb.config = _WandbConfig()
    wandb.run = types.SimpleNamespace(name="parity")
    wandb.init = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    return wandb


def _pl_stub() -> types.ModuleType:
    """pytorch_lightning stub whose LightningModule is a plain nn.Module
    with the handful of Trainer-provided hooks the reference training_steps
    call (optimizers/manual_backward/device/log)."""
    import torch

    class LightningModule(torch.nn.Module):
        _test_optimizers: list = []
        _test_schedulers: list = []
        current_epoch: int = 0

        @property
        def device(self):
            return torch.device("cpu")

        def optimizers(self):
            return self._test_optimizers

        def lr_schedulers(self):
            return self._test_schedulers

        def manual_backward(self, loss):
            loss.backward()

        def log(self, *a, **k):
            pass

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = LightningModule
    pl.Trainer = object
    return pl


def load_trainer_module(script_name: str, stop_regex: str, argv=("parity",)):
    """Execute a reference training script from /root/reference up to (but
    excluding) the first module-level line matching ``stop_regex`` —
    capturing its LightningModule class and config without running its
    module-bottom flow/dataset/Trainer code. Returns the executed module.

    This runs the reference's *actual* training_step code, which is the
    whole point of the differential tests."""
    import re

    ref = load_reference()
    import torch

    # package roots the scripts import through: plain `utils.` plus the two
    # broken roots `AAAI_Code.` / `lift_and_fill_models.` (SURVEY.md §7.3)
    mods = {
        "helpers": ref.helpers,
        "metrics": ref.metrics,
        "metrics_batch": ref.metrics_batch,
        "models_def": ref.models_def,
        "rotation_conversions": ref.rotation_conversions,
        "h36m_dataset_class": ref.h36m_dataset_class,
        "mpi_inf_3dhp_dataset_class": _load_file(
            "_ref_mpi_dataset_class",
            f"{REF_ROOT}/utils/mpi_inf_3dhp_dataset_class.py",
        ),
    }
    for root in ("utils", "AAAI_Code.utils", "lift_and_fill_models.utils"):
        top = root.split(".")[0]
        sys.modules.setdefault(top, types.ModuleType(top))
        sys.modules.setdefault(root, types.ModuleType(root))
        for name, m in mods.items():
            sys.modules[f"{root}.{name}"] = m
    for name in ("FrEIA", "FrEIA.framework", "FrEIA.modules"):
        mod = types.ModuleType(name)
        mod.SequenceINN = object
        mod.AllInOneBlock = object
        sys.modules.setdefault(name, mod)
    sys.modules["wandb"] = _wandb_stub()
    sys.modules["pytorch_lightning"] = _pl_stub()

    path = f"{REF_ROOT}/{script_name}"
    with open(path) as f:
        lines = f.readlines()
    stop = re.compile(stop_regex)
    cut = next(i for i, ln in enumerate(lines) if stop.match(ln))
    src = "".join(lines[:cut])

    mod = types.ModuleType("_ref_" + script_name.removesuffix(".py"))
    mod.__file__ = path
    old_argv = sys.argv
    sys.argv = list(argv)
    try:
        exec(compile(src, path, "exec"), mod.__dict__)
    finally:
        sys.argv = old_argv
    _install_stubs()  # script imports may have re-imported torch; re-patch
    mod.torch = torch
    return mod


def load_reference():
    """Load and return the reference utils as a namespace. Idempotent."""
    _install_stubs()
    ns = types.SimpleNamespace()
    ns.helpers = _load_file("_ref_helpers", f"{REF_ROOT}/utils/helpers.py")
    ns.metrics = _load_file("_ref_metrics", f"{REF_ROOT}/utils/metrics.py")
    ns.metrics_batch = _load_file(
        "_ref_metrics_batch", f"{REF_ROOT}/utils/metrics_batch.py"
    )
    ns.models_def = _load_file("_ref_models_def", f"{REF_ROOT}/utils/models_def.py")
    ns.rotation_conversions = _load_file(
        "_ref_rotation_conversions", f"{REF_ROOT}/utils/rotation_conversions.py"
    )

    # Dataset classes import `from AAAI_Code.utils.helpers import *` /
    # `from lift_and_fill_models.utils.helpers import *`; alias both roots
    # to the loaded helpers module.
    for root in ("AAAI_Code", "lift_and_fill_models"):
        pkg = types.ModuleType(root)
        utils_pkg = types.ModuleType(root + ".utils")
        sys.modules.setdefault(root, pkg)
        sys.modules.setdefault(root + ".utils", utils_pkg)
        sys.modules[root + ".utils.helpers"] = ns.helpers
    ns.h36m_dataset_class = _load_file(
        "_ref_h36m_dataset_class", f"{REF_ROOT}/utils/h36m_dataset_class.py"
    )
    ns.mpi_inf_3dhp_dataset_class = _load_file(
        "_ref_mpi_dataset_class", f"{REF_ROOT}/utils/mpi_inf_3dhp_dataset_class.py"
    )
    return ns
