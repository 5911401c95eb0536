"""KL-divergence (entropy) calibration, TensorRT-style.

The reference exposes `--bins` as "bins for histogram and kl"
(__main__.py:39) but only ships the percentile walk; this implements the
classic TensorRT entropy method over the same on-device |x| histograms:
for each candidate clip bin i >= target_levels, compare the clamped
reference distribution against its `target_levels`-level quantization and
pick the clip minimizing KL(ref || quant)."""
from __future__ import annotations

import numpy as np

TARGET_LEVELS = 128  # int8 symmetric positive half


def _kl_divergence(p, q):
    mask = p > 0
    p = p[mask].astype(np.float64)
    q = q[mask].astype(np.float64)
    q = np.where(q == 0, 1e-10, q)
    p = p / p.sum()
    q = q / q.sum()
    return float(np.sum(p * np.log(p / q)))


def kl_optimal_threshold(hist: np.ndarray, target_levels: int = TARGET_LEVELS):
    """Returns the optimal clip bin index (exclusive upper bin)."""
    bins = len(hist)
    hist = hist.astype(np.float64)
    if hist.sum() == 0:
        return bins
    best_i, best_kl = bins, np.inf
    for i in range(target_levels, bins + 1):
        ref = hist[:i].copy()
        outliers = hist[i:].sum()
        ref[i - 1] += outliers  # clamp tail mass into the last kept bin
        # quantize ref into target_levels buckets, then expand back
        chunk = i / target_levels
        q = np.zeros(i)
        for j in range(target_levels):
            lo = int(np.floor(j * chunk))
            hi = int(np.floor((j + 1) * chunk)) if j < target_levels - 1 else i
            seg = ref[lo:hi]
            nz = seg > 0
            if nz.any():
                q[lo:hi][nz] = seg[nz].sum() / nz.sum()
        kl = _kl_divergence(ref, q)
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i


def find_clip_val_kl_from_hists(hists, stats_min_max, bins, target_levels=TARGET_LEVELS):
    clip_val = {}
    for name, hist in hists.items():
        obs_min = stats_min_max[name]["min"]
        obs_max = stats_min_max[name]["max"]
        data_max = max(-obs_min, obs_max)
        i = kl_optimal_threshold(np.asarray(hist), target_levels)
        clip_value = (i + 0.5) * (data_max / bins)
        clip_val[name] = [np.float64(max(-clip_value, obs_min)),
                          np.float64(min(clip_value, obs_max))]
    return clip_val
