"""Test configuration: run everything on a virtual 8-device CPU platform so
data-parallel sharding logic is exercised without TPU hardware
(SURVEY.md §4). Must run before the first jax import."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; pin the platform explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated runs reuse every jitted program
# (the suite's wall time is compile-dominated — VERDICT.md round 1 weak #1).
# Scoped per host CPU-feature set: XLA:CPU AOT entries encode the compile
# machine's ISA, and this gitignored dir survives driver rounds that land
# on different machines — loading a foreign entry risks SIGILL.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_graft_entry", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", "__graft_entry__.py"))
_ge = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_ge)
_cache_dir = _ge._machine_cache_dir(
    os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", ".jax_cache")))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
