"""ctypes bindings for the native packed-dataset loader
(native/dataloader.cc).

Covers the larger-than-HBM case: a packed binary file is mmap'd on the host
and shuffled epoch batches are gathered by a C++ thread pool while the
device computes. Falls back to a numpy implementation with the same API
when the shared library has not been built (``make -C native`` or
``build_native()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def _machine_tag() -> str:
    """CPU-feature fingerprint (same recipe as the jax compile-cache
    scoping in __graft_entry__._machine_cache_dir): the library is built
    -march=native, so a .so left behind by a different host must never be
    loaded — it would SIGILL on first call."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            sig = next(line for line in f if line.startswith("flags"))
    except Exception:
        sig = platform.processor() or platform.machine()
    tag = hashlib.sha256(sig.encode()).hexdigest()[:12]
    return f"{platform.machine()}-{tag}"


_LIB_PATH = _NATIVE_DIR / f"liblinks_dataloader-{_machine_tag()}.so"
_lib = None


def build_native(force: bool = False) -> bool:
    """Compile this machine's shared library if a toolchain is available."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR), f"LIB={_LIB_PATH.name}"],
                       check=True, capture_output=True)
        return _LIB_PATH.exists()
    except (OSError, subprocess.CalledProcessError):
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.links_pack.restype = ctypes.c_int
    lib.links_pack.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_uint64, ctypes.c_uint64]
    lib.links_open.restype = ctypes.c_void_p
    lib.links_open.argtypes = [ctypes.c_char_p]
    lib.links_rows.restype = ctypes.c_uint64
    lib.links_rows.argtypes = [ctypes.c_void_p]
    lib.links_cols.restype = ctypes.c_uint64
    lib.links_cols.argtypes = [ctypes.c_void_p]
    lib.links_shuffle.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.links_gather.restype = ctypes.c_int
    lib.links_gather.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int]
    lib.links_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def pack_dataset(path, data: np.ndarray):
    """Write a (N, D) float32 array as a packed LNKS file."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    lib = _load_lib()
    if lib is not None:
        rc = lib.links_pack(
            str(path).encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data.shape[0], data.shape[1],
        )
        if rc != 0:
            raise OSError(f"links_pack failed: {rc}")
        return
    # numpy fallback: same byte layout
    with open(path, "wb") as f:
        hdr = np.array([0x4C4E4B53, 1], dtype=np.uint32).tobytes()
        dims = np.array(data.shape, dtype=np.uint64).tobytes()
        f.write(hdr + dims + data.tobytes())


class PackedDataset:
    """Shuffled batch iterator over a packed file (native when built)."""

    def __init__(self, path, n_threads: int | None = None):
        self.path = str(path)
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.links_open(self.path.encode())
            if not self._h:
                raise OSError(f"cannot open packed dataset {path}")
            self.n_rows = int(self._lib.links_rows(self._h))
            self.n_cols = int(self._lib.links_cols(self._h))
            self._data = None
            self._perm = None
        else:  # numpy fallback
            self._h = None
            raw = np.fromfile(self.path, dtype=np.uint8)
            magic = np.frombuffer(raw[:8], dtype=np.uint32)
            assert magic[0] == 0x4C4E4B53 and magic[1] == 1, "bad LNKS file"
            dims = np.frombuffer(raw[8:24], dtype=np.uint64)
            self.n_rows, self.n_cols = int(dims[0]), int(dims[1])
            self._data = np.frombuffer(
                raw[24:24 + self.n_rows * self.n_cols * 4], dtype=np.float32
            ).reshape(self.n_rows, self.n_cols)
            self._perm = np.arange(self.n_rows)

    def shuffle(self, seed: int):
        if self._h is not None:
            self._lib.links_shuffle(self._h, seed)
        else:
            self._perm = np.random.default_rng(seed).permutation(self.n_rows)

    def gather(self, start: int, count: int) -> np.ndarray:
        if start < 0 or count < 0 or start + count > self.n_rows:
            raise IndexError(
                f"gather [{start}, {start + count}) out of range for "
                f"{self.n_rows} rows")
        out = np.empty((count, self.n_cols), dtype=np.float32)
        if self._h is not None:
            rc = self._lib.links_gather(
                self._h, start, count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads,
            )
            if rc != 0:
                raise IndexError("links_gather out of range")
        else:
            out[:] = self._data[self._perm[start:start + count]]
        return out

    def epoch_batches(self, batch_size: int, seed: int):
        """Yield shuffled (batch_size, D) batches; drops the ragged tail
        (matching the device-resident epoch scan)."""
        self.shuffle(seed)
        for start in range(0, self.n_rows - batch_size + 1, batch_size):
            yield self.gather(start, batch_size)

    def close(self):
        if self._h is not None:
            self._lib.links_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
