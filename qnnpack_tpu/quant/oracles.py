"""Numpy int64 scalar oracles mirroring the reference C requantization exactly.

These are the test-side ground truth, the analogue of the reference's scalar
requantization variants used by its gtest fixtures:
  - oracle_q31:      qnnp_q31_requantize, requantization.h:464-480
  - oracle_precise:  qnnp_requantize_precise__scalar_signed64,
                     precise-scalar.c:233-319
  - oracle_fp32:     qnnp_requantize_fp32__scalar_lrintf, fp32-scalar.c:17-65
  - oracle_gemmlowp: qnnp_requantize_gemmlowp__scalar, gemmlowp-scalar.c:19-78
  - oracle_avgpool:  qnnp_avgpool_quantize, requantization.h:482-498
  - oracle_add:      qnnp_add_quantize, requantization.h:500-522

They run host-side with real 64-bit integers (no limb tricks), so the on-device
32-bit-limb implementations in requantize.py are validated against independent
arithmetic, not against themselves.
"""

from __future__ import annotations

import numpy as np

from .params import (AddQuantParams, AvgPoolQuantParams, FP32Params,
                     GemmlowpParams, PreciseParams, Q31Params)

_I64 = np.int64


def _asr(x, n):
    """Arithmetic shift right on int64 numpy values."""
    return np.right_shift(x.astype(_I64), n)


def oracle_q31(x, params: Q31Params) -> np.ndarray:
    x = np.asarray(x, dtype=np.int32).astype(_I64)
    product = x * _I64(params.multiplier)
    # Low 32 bits of (product + 2^30) >> 31, sign-extended.
    q31product = ((product + _I64(0x40000000)) >> 31).astype(np.int32).astype(_I64)
    remainder = (q31product & _I64(params.remainder_mask)) - (x < 0)
    scaled = _asr(q31product, params.shift) + (remainder > _I64(params.remainder_threshold))
    clamped = np.clip(scaled, params.min_less_zero_point, params.max_less_zero_point)
    return (clamped + params.zero_point).astype(np.uint8)


def oracle_precise(x, params: PreciseParams) -> np.ndarray:
    x = np.asarray(x, dtype=np.int32).astype(_I64)
    product = x * _I64(params.multiplier)
    adjusted = product - (x < 0)
    rounding = _I64(1) << (params.shift - 1)
    scaled = _asr(adjusted + rounding, params.shift)
    smin = params.qmin - params.zero_point
    smax = params.qmax - params.zero_point
    clamped = np.clip(scaled, smin, smax)
    return (clamped + params.zero_point).astype(np.uint8)


def oracle_fp32(x, params: FP32Params) -> np.ndarray:
    x = np.asarray(x, dtype=np.int32)
    scaled = x.astype(np.float32) * np.float32(params.scale)
    rounded = np.rint(scaled).astype(_I64)
    smin = params.qmin - params.zero_point
    smax = params.qmax - params.zero_point
    clamped = np.clip(rounded, smin, smax)
    return (clamped + params.zero_point).astype(np.uint8)


def oracle_gemmlowp(x, params: GemmlowpParams) -> np.ndarray:
    x = np.asarray(x, dtype=np.int32).astype(_I64)
    ab = x * _I64(params.multiplier)
    nudge = np.where(x >= 0, _I64(0x40000000), _I64(-0x3FFFFFFF))
    # C truncating division by 2^31.
    num = ab + nudge
    q = (np.sign(num) * (np.abs(num) // _I64(0x80000000))).astype(np.int32).astype(_I64)
    if params.shift > 0:
        mask = _I64((1 << params.shift) - 1)
        remainder = q & mask
        threshold = (mask >> 1) + (q < 0)
        q = _asr(q, params.shift) + (remainder > threshold)
    biased = q + params.zero_point
    return np.clip(biased, params.qmin, params.qmax).astype(np.uint8)


def oracle_avgpool(x, params: AvgPoolQuantParams) -> np.ndarray:
    x = np.asarray(x, dtype=np.int32).astype(_I64)
    product = x * _I64(params.multiplier)
    adjusted = product - (x < 0)
    rounding = _I64(1) << (params.shift - 1)
    scaled = _asr(adjusted + rounding, params.shift).astype(np.int32).astype(_I64)
    clamped = np.clip(scaled, params.output_min_less_zero_point,
                      params.output_max_less_zero_point)
    return (clamped + params.output_zero_point).astype(np.uint8)


def oracle_add(a, b, params: AddQuantParams) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint8).astype(_I64)
    b = np.asarray(b, dtype=np.uint8).astype(_I64)
    acc = (params.zero_point_product + a * params.a_multiplier
           + b * params.b_multiplier).astype(np.int32).astype(_I64)
    remainder = (acc & _I64(params.remainder_mask)) - (acc < 0)
    acc = _asr(acc, params.shift) + (remainder > _I64(params.remainder_threshold))
    y = acc + params.y_zero_point
    y = np.minimum(y, params.y_max)
    y = np.maximum(y, params.y_min)
    return y.astype(np.uint8)
