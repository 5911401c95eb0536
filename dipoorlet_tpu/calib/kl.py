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
    """Returns the optimal clip bin index (exclusive upper bin).

    The candidate loop stays in Python but each candidate's
    quantize-and-expand is fully vectorized (np.add.reduceat over the
    bucket edges + gather), turning the original O(bins x levels) Python
    inner loop (minutes of host time at bins=2048 across hundreds of
    tensors) into a handful of numpy vector ops per candidate — results
    are bit-identical to the loop formulation."""
    bins = len(hist)
    hist = hist.astype(np.float64)
    if hist.sum() == 0:
        return bins
    tail = np.concatenate([np.cumsum(hist[::-1])[::-1], [0.0]])  # tail[i] = sum(hist[i:])
    j = np.arange(target_levels, dtype=np.float64)
    best_i, best_kl = bins, np.inf
    for i in range(target_levels, bins + 1):
        # reference P: kept bins with the tail mass clamped into the last
        ref = hist[:i].copy()
        ref[i - 1] += tail[i]
        nz = ref > 0
        # candidate Q: the UNCLAMPED slice quantized to target_levels and
        # re-expanded (the canonical TRT/MXNet asymmetry — quantizing the
        # clamped P instead makes i == target_levels an exact identity with
        # KL == 0, degenerating the whole search to the smallest clip).
        # bucket edges lo_j = floor(j * i / levels); bin k belongs to
        # bucket j iff lo_j <= k < lo_{j+1} (last bucket absorbs to i)
        edges = np.floor(j * (i / target_levels)).astype(np.int64)
        seg_sum = np.add.reduceat(hist[:i], edges)
        seg_cnt = np.add.reduceat(nz.astype(np.float64), edges)
        avg = np.divide(seg_sum, seg_cnt, out=np.zeros_like(seg_sum),
                        where=seg_cnt > 0)
        bucket_of = np.repeat(np.arange(target_levels),
                              np.diff(np.append(edges, i)))
        q = np.where(nz, avg[bucket_of], 0.0)
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
