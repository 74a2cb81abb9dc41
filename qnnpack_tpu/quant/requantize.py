"""Vectorized requantization schemes: int32 accumulator -> uint8.

TPU-native re-implementations of the reference's four requantization schemes,
bit-exact to the scalar C oracles:

  - q31:      /root/reference/src/requantization/q31-scalar.c:17-138 and the
              operator-level oracle qnnp_q31_requantize
              (/root/reference/src/qnnpack/requantization.h:464-480).  These two
              are provably identical: with multiplier > 0 the sign of the Q31
              product equals the sign of the input (q31product == 0 only when
              no increment happens either way), and the NEON
              vqrdmulh+vsra+vrshl epilogue (src/q8gemm/4x8-neon.c:265-292)
              computes the same rounding, so a single function serves as the
              kernel-epilogue contract.
  - precise:  round-half-away-from-zero via exact u32xu32->u64 product
              (/root/reference/src/requantization/precise-scalar.c:138-231).
  - fp32:     float32 multiply + round-half-to-even
              (/root/reference/src/requantization/fp32-scalar.c:17-65, lrintf).
  - gemmlowp: upstream gemmlowp semantics - sign-dependent nudge, truncating
              division by 2^31, round-up-at-threshold divide-by-pot
              (/root/reference/src/requantization/gemmlowp-scalar.{c,h}).

All 64-bit intermediates use 32-bit limb pairs (see int_arith.py), so these
functions run unchanged in jnp/XLA and inside Pallas TPU kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import int_arith as ia
from .params import (AddQuantParams, AvgPoolQuantParams, ClampParams,
                     FP32Params, GemmlowpParams, PerChannelFP32Params,
                     PreciseParams, Q31Params)


def _clamp_bias_u8(scaled, smin: int, smax: int, zero_point: int):
    """Clamp to [smin, smax] then add zero point, returning uint8."""
    clamped = jnp.clip(scaled, jnp.int32(smin), jnp.int32(smax))
    return (clamped + jnp.int32(zero_point)).astype(jnp.uint8)


def q31_multiply(x, multiplier: int):
    """Rounding-doubling high multiply: (x * m + 2^30) >> 31, low 32 bits.

    The VQRDMULH.S32 analogue (constant +2^30 nudge); saturation is
    unreachable because multiplier is always positive.
    """
    hi, lo = ia.smul32_wide_const(x, multiplier)
    hi, lo = ia.add64_scalar(hi, lo, 0x40000000)
    return ia.i32((lo >> 31) | (hi << 1))


def round_shift_q31(q31product, shift: int, threshold: int, mask: int):
    """asr with round-half-away-from-zero via the remainder trick
    (q31-scalar.c:102-110)."""
    if shift == 0:
        return q31product
    remainder = (q31product & jnp.int32(mask)) - (q31product < 0).astype(jnp.int32)
    return (q31product >> shift) + (remainder > jnp.int32(threshold)).astype(jnp.int32)


def requantize_q31(x, params: Q31Params):
    """Q31 requantization: int32 array -> uint8 array."""
    x = jnp.asarray(x, jnp.int32)
    q = q31_multiply(x, params.multiplier)
    scaled = round_shift_q31(q, params.shift, params.remainder_threshold,
                             params.remainder_mask)
    return _clamp_bias_u8(scaled, params.min_less_zero_point,
                          params.max_less_zero_point, params.zero_point)


def requantize_precise(x, params: PreciseParams):
    """Precise requantization: exact scale, round half away from zero."""
    x = jnp.asarray(x, jnp.int32)
    x_abs = ia.abs_u32(x)
    hi, lo = ia.umul32_wide(x_abs, jnp.uint32(params.multiplier))
    hi, lo = ia.add64_scalar(hi, lo, 1 << (params.shift - 1))
    abs_scaled = ia.shr64_lo32(hi, lo, params.shift)
    scaled = ia.i32(jnp.where(x >= 0, abs_scaled, ia.neg_u32(abs_scaled)))
    return _clamp_bias_u8(scaled, params.qmin - params.zero_point,
                          params.qmax - params.zero_point, params.zero_point)


def requantize_fp32(x, params: FP32Params):
    """fp32 requantization: float multiply, round half to even (lrintf)."""
    x = jnp.asarray(x, jnp.int32)
    scaled = x.astype(jnp.float32) * jnp.float32(params.scale)
    rounded = jnp.rint(scaled)
    lmin = float(params.qmin - params.zero_point)
    lmax = float(params.qmax - params.zero_point)
    clamped = jnp.clip(rounded, lmin, lmax).astype(jnp.int32)
    return (clamped + jnp.int32(params.zero_point)).astype(jnp.uint8)


def requantize_fp32_per_channel(x, params: PerChannelFP32Params):
    """Per-output-channel fp32 requantization; channels on the last axis.

    Same lrintf numerics as requantize_fp32 with a vector scale - the
    per-channel extension of fp32-scalar.c:17-65 (the reference itself is
    per-tensor only)."""
    x = jnp.asarray(x, jnp.int32)
    if x.shape[-1] != len(params.scales):
        raise ValueError(
            f"last axis {x.shape[-1]} != {len(params.scales)} channel scales")
    scale = jnp.asarray(params.scales, jnp.float32)
    scaled = x.astype(jnp.float32) * scale
    rounded = jnp.rint(scaled)
    lmin = float(params.qmin - params.zero_point)
    lmax = float(params.qmax - params.zero_point)
    clamped = jnp.clip(rounded, lmin, lmax).astype(jnp.int32)
    return (clamped + jnp.int32(params.zero_point)).astype(jnp.uint8)


def requantize_gemmlowp(x, params: GemmlowpParams):
    """gemmlowp-semantics requantization (test/bench parity oracle)."""
    x = jnp.asarray(x, jnp.int32)
    hi, lo = ia.smul32_wide_const(x, params.multiplier)
    # Sign-dependent nudge; multiplier > 0 so sign(x^m) == sign(x).
    neg = x < 0
    nudge_lo = jnp.where(neg, jnp.uint32((-0x3FFFFFFF) & 0xFFFFFFFF),
                         jnp.uint32(0x40000000))
    nudge_hi = jnp.where(neg, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    hi, lo = ia.add64(hi, lo, nudge_hi, nudge_lo)
    # Truncating (toward-zero) division by 2^31, per gemmlowp-scalar.h:41.
    q = ia.i32((lo >> 31) | (hi << 1))
    frac_nonzero = (lo & jnp.uint32(0x7FFFFFFF)) != 0
    is_neg64 = ia.i32(hi) < 0
    q = q + (is_neg64 & frac_nonzero).astype(jnp.int32)
    # RoundingDivideByPOT: threshold includes the sign (gemmlowp-scalar.h:44-50).
    if params.shift > 0:
        mask = (1 << params.shift) - 1
        remainder = q & jnp.int32(mask)
        threshold = jnp.int32(mask >> 1) + (q < 0).astype(jnp.int32)
        q = (q >> params.shift) + (remainder > threshold).astype(jnp.int32)
    # gemmlowp adds the zero point before clamping (gemmlowp-scalar.c:59-70).
    biased = q + jnp.int32(params.zero_point)
    return jnp.clip(biased, jnp.int32(params.qmin),
                    jnp.int32(params.qmax)).astype(jnp.uint8)


def avgpool_quantize(x, params: AvgPoolQuantParams):
    """Average-pooling requantization of a bias-inclusive int32 accumulator.

    Mirrors qnnp_avgpool_quantize (requantization.h:482-498): signed 64-bit
    product, -1 adjustment for negative inputs, round-half-up 64-bit shift.
    """
    x = jnp.asarray(x, jnp.int32)
    hi, lo = ia.smul32_wide_const(x, params.multiplier)
    hi, lo = ia.sub64_one_where(hi, lo, x < 0)
    hi, lo = ia.add64_scalar(hi, lo, 1 << (params.shift - 1))
    scaled = ia.i32(ia.asr64_lo32(hi, lo, params.shift))
    return _clamp_bias_u8(scaled, params.output_min_less_zero_point,
                          params.output_max_less_zero_point,
                          params.output_zero_point)


def add_quantize(a, b, params: AddQuantParams):
    """Quantized elementwise add of two uint8 arrays.

    Mirrors qnnp_add_quantize (requantization.h:500-522): dual-multiplier
    accumulate in int32, remainder-rounded shift, clamp after zero point.
    """
    a = jnp.asarray(a).astype(jnp.int32)
    b = jnp.asarray(b).astype(jnp.int32)
    acc = (jnp.int32(params.zero_point_product)
           + a * jnp.int32(params.a_multiplier)
           + b * jnp.int32(params.b_multiplier))
    remainder = (acc & jnp.int32(params.remainder_mask)) - (acc < 0).astype(jnp.int32)
    acc = (acc >> params.shift) + \
        (remainder > jnp.int32(params.remainder_threshold)).astype(jnp.int32)
    y = acc + jnp.int32(params.y_zero_point)
    y = jnp.minimum(y, jnp.int32(params.y_max))
    y = jnp.maximum(y, jnp.int32(params.y_min))
    return y.astype(jnp.uint8)


def clamp_u8(x, params: ClampParams):
    """uint8 clamp (u8clamp ukernel analogue, src/u8clamp/)."""
    x = jnp.asarray(x, jnp.uint8)
    return jnp.clip(x, jnp.uint8(params.output_min), jnp.uint8(params.output_max))
