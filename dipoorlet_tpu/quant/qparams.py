"""Quantization parameter derivation.

Behavioral port of the reference's scale/zero-point math
(/root/reference/dipoorlet/quantize.py:111-194):

  * symmetric: q in [-(2^(b-1)-1), 2^(b-1)-1]; scale = amax/q_max;
    all-zero channels get scale 1.
  * asymmetric per-layer: range widened to include 0; scale=(max-min)/(2^b-1);
    zero_point = round(-min/scale); q_min=-zp, q_max=2^b-1-zp.
  * asymmetric per-channel: per-channel min clamped <=0, max >= 0.
  * dynamic_sym (TI): activation with min≈0 switches to asymmetric,
    gaining one effective bit.
  * log_scale: scale snapped to 2^round(log2(scale)).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class QParams:
    scale: np.ndarray          # shape () or (C,)
    zero_point: np.ndarray     # int64, same shape as scale
    q_min: np.ndarray          # int64
    q_max: np.ndarray
    bit_width: int
    symmetric: bool
    per_channel: bool
    log_scale: bool = False

    @property
    def zp_dtype(self):
        return np.int8 if self.symmetric else np.uint8

    def scale_f32(self) -> np.ndarray:
        return np.asarray(self.scale, dtype=np.float32)


def compute_qparams(param: dict, rng_min, rng_max, dynamic_sym_hint: bool = True) -> QParams:
    """param: a platform qw_params/qi_params dict (bit_width, symmetric,
    per_channel, log_scale, dynamic_sym). rng_min/rng_max: scalars or
    per-channel arrays of observed ranges."""
    if param.get("type", "Linear") != "Linear":
        raise NotImplementedError("only Linear quantization is supported")
    bit_width = param["bit_width"]
    symmetric = param["symmetric"]
    per_channel = bool(param.get("per_channel", False))

    rmin = np.asarray(rng_min, dtype=np.float64)
    rmax = np.asarray(rng_max, dtype=np.float64)
    if not per_channel:
        rmin = np.min(rmin)
        rmax = np.max(rmax)
        # dynamic_sym only applies to (per-layer) activations (quantize.py:123-127)
        if param.get("dynamic_sym") and dynamic_sym_hint and abs(rmin) < 1e-6:
            symmetric = False

    if symmetric:
        amax = np.maximum(np.abs(rmin), np.abs(rmax))
        q_max_val = 2 ** (bit_width - 1) - 1
        q_min_val = -q_max_val  # 8bit -128..127 used as -127..127 (quantize.py:133-135)
        scale = amax / q_max_val
        scale = np.where(scale == 0, 1.0, scale)
        zero_point = np.zeros_like(scale, dtype=np.int64)
        q_min = np.full_like(zero_point, q_min_val)
        q_max = np.full_like(zero_point, q_max_val)
    else:
        if per_channel and rmin.ndim >= 1:
            dmin = np.minimum(rmin, 0.0)
            dmax = np.maximum(rmax, 0.0)
        else:
            dmin = min(0.0, float(rmin))
            dmax = max(0.0, float(rmax))
        scale = (np.asarray(dmax) - np.asarray(dmin)) / (2 ** bit_width - 1)
        scale = np.where(scale == 0, 1.0, scale)
        zero_point = np.round(-np.asarray(dmin) / scale).astype(np.int64)
        q_min = -zero_point
        q_max = (2 ** bit_width - 1 - zero_point).astype(np.int64)

    if param.get("log_scale"):
        scale = 2.0 ** np.round(np.log2(scale))

    scale = np.asarray(scale, dtype=np.float32)
    zero_point = np.broadcast_to(np.asarray(zero_point, dtype=np.int64), scale.shape).copy()
    q_min = np.broadcast_to(np.asarray(q_min, dtype=np.int64), scale.shape).copy()
    q_max = np.broadcast_to(np.asarray(q_max, dtype=np.int64), scale.shape).copy()
    return QParams(scale=scale, zero_point=zero_point, q_min=q_min, q_max=q_max,
                   bit_width=bit_width, symmetric=symmetric, per_channel=per_channel,
                   log_scale=bool(param.get("log_scale", False)))
