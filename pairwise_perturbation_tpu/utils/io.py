"""Dataset IO and solver checkpointing.

Replaces the reference's MPI-IO path (``MPI_File_open`` +
``read_dense_from_file``, test_ALS.cxx:291-321) with memmapped host reads
(chunked dtype conversion, so the 2.7 GB f64 coil-100 file converts to f32
without a second full-size temp), and adds factor checkpointing the
reference lacks (SURVEY.md section 5: "add factor checkpointing anyway").

Dataset layouts (row-major float64 binaries, produced by the reference's
script/imageloader.py and script/matloader.py):

- coil-100   : declared tensor shape (3, 128, 128, 7200)  (test_ALS.cxx:293-297)
- time-lapse : declared tensor shape (33, 1344, 1024, 9)   (test_ALS.cxx:312-316)
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np

COIL100_SHAPE = (3, 128, 128, 7200)
TIME_LAPSE_SHAPE = (33, 1344, 1024, 9)


def read_dense_binary(path: str, shape: Sequence[int], file_dtype="<f8",
                      out_dtype=np.float32, chunk_elems: int = 1 << 24
                      ) -> np.ndarray:
    """Read a row-major dense binary into ``out_dtype`` without a full-size
    intermediate copy."""
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    # fast path: threaded native loader (native/loader.cpp)
    if np.dtype(file_dtype) == np.dtype("<f8"):
        from pairwise_perturbation_tpu import native
        if np.dtype(out_dtype) == np.float32:
            out = native.load_f64_as_f32(path, shape)
            if out is not None:
                return out
        elif np.dtype(out_dtype) == np.float64:
            out = native.load_f64(path, shape)
            if out is not None:
                return out
    mm = np.memmap(path, dtype=file_dtype, mode="r", shape=(n,))
    out = np.empty(n, dtype=out_dtype)
    for lo in range(0, n, chunk_elems):
        hi = min(lo + chunk_elems, n)
        out[lo:hi] = mm[lo:hi]
    del mm
    return out.reshape(shape)


def write_dense_binary(path: str, V: np.ndarray, file_dtype="<f8") -> None:
    np.asarray(V, dtype=file_dtype).tofile(path)


def load_coil100(path: str = "coil-100.bin", out_dtype=np.float32):
    return read_dense_binary(path, COIL100_SHAPE, out_dtype=out_dtype)


def load_time_lapse(path: str = "time-lapse.bin", out_dtype=np.float32):
    return read_dense_binary(path, TIME_LAPSE_SHAPE, out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# Dataset builders (replacements for script/imageloader.py, script/matloader.py)
# ---------------------------------------------------------------------------


def build_coil100_binary(png_dir: str, out_path: str = "coil-100.bin"):
    """PNG directory -> float64 binary of shape (7200, 128, 128, 3)
    (imageloader.py:26-31). Requires PIL."""
    from PIL import Image  # gated: PIL is optional
    files = sorted(f for f in os.listdir(png_dir) if f.endswith(".png"))
    arr = np.zeros((len(files), 128, 128, 3), dtype=np.float64)
    for i, f in enumerate(files):
        img = Image.open(os.path.join(png_dir, f)).convert("RGB")
        arr[i] = np.asarray(img.resize((128, 128)), dtype=np.float64)
    arr.tofile(out_path)
    return out_path


def build_time_lapse_binary(mat_dir: str, out_path: str = "time-lapse.bin"):
    """9 .mat HSI files -> float64 binary (9, 1024, 1344, 33)
    (matloader.py:1-45). Requires scipy."""
    from scipy.io import loadmat  # gated: scipy is optional
    files = sorted(f for f in os.listdir(mat_dir) if f.endswith(".mat"))
    out = None
    for i, f in enumerate(files):
        m = loadmat(os.path.join(mat_dir, f))
        key = [k for k in m if not k.startswith("__")][0]
        data = np.asarray(m[key], dtype=np.float64)
        if out is None:
            out = np.zeros((len(files),) + data.shape, dtype=np.float64)
        out[i] = data
    out.tofile(out_path)
    return out_path


# ---------------------------------------------------------------------------
# Checkpointing (new capability; reference persists nothing)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, factors: Sequence, iteration: int,
                    core=None, meta: Optional[dict] = None) -> None:
    arrays = {f"W{i}": np.asarray(W) for i, W in enumerate(factors)}
    if core is not None:
        arrays["core"] = np.asarray(core)
    arrays["_iteration"] = np.asarray(iteration)
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    factors: List[np.ndarray] = []
    i = 0
    while f"W{i}" in data:
        factors.append(data[f"W{i}"])
        i += 1
    core = data["core"] if "core" in data else None
    iteration = int(data["_iteration"])
    meta = json.loads(bytes(data["_meta"]).decode()) if "_meta" in data else {}
    return dict(factors=factors, core=core, iteration=iteration, meta=meta)
