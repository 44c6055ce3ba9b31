"""Native host-side components, built on demand with the system C compiler.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it (here: the
data-loader's random-crop batcher) is plain C loaded via ctypes, with a pure
NumPy/Python fallback when no compiler is available. Build artifacts are
cached next to the source (.so keyed by source mtime).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.c")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    so_path = os.path.join(_HERE, "_batcher.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so_path, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RQVAE_TPU_DISABLE_NATIVE", "0") == "1":
        return None
    so = _build()
    if so is None:
        print(
            "rqvae_tpu.native: no C compiler found, using the Python batcher",
            file=sys.stderr,
        )
        return None
    lib = ctypes.CDLL(so)
    lib.subsample_batch.restype = None
    lib.subsample_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def subsample_batch(
    item_ids: np.ndarray,     # (n_rows, row_len) int32, -1 tail-padded
    item_ids_fut: np.ndarray, # (n_rows,) or (n_rows, 1) int32
    idx: np.ndarray,          # (batch,) integer row indices
    max_seq_len: int,
    seed: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C random-crop batcher; returns None when the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    item_ids = np.ascontiguousarray(item_ids, np.int32)
    fut = np.ascontiguousarray(item_ids_fut, np.int32).reshape(-1)
    idx = np.ascontiguousarray(idx, np.int64)
    batch = idx.shape[0]
    out_ids = np.empty((batch, max_seq_len), np.int32)
    out_fut = np.empty((batch,), np.int32)
    lib.subsample_batch(
        item_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        item_ids.shape[0], item_ids.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch, max_seq_len, ctypes.c_uint64(seed & (2**64 - 1)),
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_fut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_ids, out_fut
