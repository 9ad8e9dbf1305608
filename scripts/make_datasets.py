"""Generate STAND-IN coil-100 / time-lapse binaries (no network egress).

The benchmark environment cannot download the real datasets
(scripts/get_coil100.sh / get_time_lapse.sh need network), so this
generates structurally realistic stand-ins through the SAME pipeline
contract as the reference loaders:

- coil-100 (script/imageloader.py:26-31): 100 objects x 72 rotation
  views -> float64 binary, row-major (7200, 128, 128, 3), values 0..255.
  Each object is a smooth low-frequency random color blob on a black
  background, physically rotated per view with scipy.ndimage.rotate —
  consecutive views are highly correlated, giving the rapidly decaying
  mode spectra, nonnegative 0-255 range, and ill-conditioned Gram
  matrices that make the real dataset a meaningful ALS benchmark
  (unstructured uniform noise has none of these properties).

- time-lapse (script/matloader.py:1-45): 9 hyperspectral frames ->
  float64 binary, row-major (9, 1024, 1344, 33). Scene = linear mixture
  of 6 endmembers: smooth random abundance maps (FFT low-pass fields)
  x smooth spectral signatures, with per-frame illumination drift and
  slowly moving abundances + sensor noise — the classic HSI low-rank
  + smooth structure.

These are NOT the real datasets; results on them are labeled
"(stand-in)" in results/. The file layout, dtype, shape, and value
ranges match the documented pipeline exactly, so swapping in the real
binaries requires no code change.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _lowpass_field(rng, shape, cutoff_frac, dtype=np.float64):
    """Smooth random field in [0, 1] via FFT low-pass of white noise."""
    noise = rng.standard_normal(shape)
    F = np.fft.rfftn(noise)
    cut = np.ones_like(F)
    for ax, s in enumerate(shape):
        n = F.shape[ax]
        freqs = np.fft.fftfreq(s)[:n] if ax == len(shape) - 1 \
            else np.fft.fftfreq(s)
        mask = (np.abs(freqs) <= cutoff_frac).astype(float)
        sl = [None] * len(shape)
        sl[ax] = slice(None)
        cut = cut * mask[tuple(sl)]
    sm = np.fft.irfftn(F * cut, s=shape)
    lo, hi = sm.min(), sm.max()
    return ((sm - lo) / max(hi - lo, 1e-12)).astype(dtype)


def make_coil100(out_path="coil-100.bin", seed=0, n_objects=100, n_views=72,
                 size=128):
    from scipy import ndimage
    rng = np.random.default_rng(seed)
    out = np.lib.format.open_memmap  # noqa: F841 (kept simple: plain file)
    total = n_objects * n_views
    with open(out_path, "wb") as f:
        yy, xx = np.mgrid[0:size, 0:size]
        cy = cx = (size - 1) / 2.0
        rad = np.hypot(yy - cy, xx - cx)
        for obj in range(n_objects):
            # smooth random RGB texture on an object-shaped mask
            tex = np.stack([_lowpass_field(rng, (size, size),
                                           rng.uniform(0.03, 0.12))
                            for _ in range(3)], axis=-1)
            # random blob mask: thresholded smooth field inside a disk
            blob = _lowpass_field(rng, (size, size), 0.06)
            mask = (blob > np.quantile(blob, 0.45)) & (rad < size * 0.42)
            base = tex * mask[..., None] * rng.uniform(180, 255)
            base = np.clip(base, 0, 255)
            for v in range(n_views):
                ang = 360.0 * v / n_views
                img = ndimage.rotate(base, ang, axes=(0, 1), reshape=False,
                                     order=1, mode="constant", cval=0.0)
                np.clip(img, 0, 255, out=img)
                img.astype("<f8").tofile(f)
            if obj % 20 == 0:
                print(f"  coil-100 stand-in: object {obj}/{n_objects}",
                      flush=True)
    sz = os.path.getsize(out_path)
    assert sz == total * size * size * 3 * 8, sz
    print(f"wrote {out_path} ({sz/1e9:.2f} GB, row-major "
          f"({total}, {size}, {size}, 3) float64)")


def make_time_lapse(out_path="time-lapse.bin", seed=1, T=9, H=1024, W=1344,
                    B=33, K=6):
    rng = np.random.default_rng(seed)
    # endmember spectra: smooth positive curves over B bands
    bands = np.linspace(0, 1, B)
    spectra = []
    for k in range(K):
        c = rng.uniform(0.1, 0.9, size=3)
        w = rng.uniform(0.05, 0.35, size=3)
        a = rng.uniform(0.3, 1.0, size=3)
        s = sum(ai * np.exp(-0.5 * ((bands - ci) / wi) ** 2)
                for ai, ci, wi in zip(a, c, w)) + 0.05
        spectra.append(s)
    spectra = np.stack(spectra)            # (K, B)
    # base abundance maps + a slow drift direction per endmember
    ab0 = np.stack([_lowpass_field(rng, (H, W), 0.02) for _ in range(K)])
    drift = np.stack([_lowpass_field(rng, (H, W), 0.015) - 0.5
                      for _ in range(K)])
    illum = 1.0 + 0.25 * np.sin(np.linspace(0, 2.4, T) + rng.uniform(0, 2))
    with open(out_path, "wb") as f:
        for t in range(T):
            ab = np.clip(ab0 + (t / max(T - 1, 1)) * 0.3 * drift, 0, None)
            # frame[h, w, b] = illum_t * sum_k ab_k[h, w] * spec_k[b] + noise
            frame = np.tensordot(ab, spectra, axes=(0, 0)) * illum[t]
            frame += 0.01 * frame.mean() * rng.standard_normal((H, W, B))
            np.clip(frame, 0, None, out=frame)
            frame.astype("<f8").tofile(f)
            print(f"  time-lapse stand-in: frame {t + 1}/{T}", flush=True)
    sz = os.path.getsize(out_path)
    assert sz == T * H * W * B * 8, sz
    print(f"wrote {out_path} ({sz/1e9:.2f} GB, row-major "
          f"({T}, {H}, {W}, {B}) float64)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "."
    if which in ("all", "coil"):
        make_coil100(os.path.join(outdir, "coil-100.bin"))
    if which in ("all", "timelapse"):
        make_time_lapse(os.path.join(outdir, "time-lapse.bin"))
