"""Portable 32-bit limb arithmetic for exact 64-bit integer math on TPU.

TPU vector units have no 64-bit integer multiply, and Pallas/Mosaic does not
support int64 at all.  The reference library's requantization math, however, is
specified in terms of exact 64-bit products of 32-bit factors (e.g. the Q31
rounding-doubling-high-multiply, /root/reference/src/requantization/q31-scalar.c:60-74,
and the precise scheme's u32xu32->u64 product,
/root/reference/src/requantization/precise-scalar.c:58-102).

This module provides those 64-bit operations as (hi, lo) pairs of uint32
lanes, using only 16-bit limb multiplies and 32-bit adds/shifts - operations
the TPU VPU executes natively.  Every function works identically under plain
`jax.numpy`, inside `jax.jit`, and inside Pallas TPU kernels, so the same
numerics code backs both the XLA operator path and the fused Pallas epilogues.

All shift amounts are *static* Python ints: quantization parameters are
derived host-side from float scales at operator-create time (mirroring the
reference's create-time param precompute, src/qnnpack/requantization.h:22-120)
and baked into the jitted program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_MASK16 = 0xFFFF


def i32(x):
    """Bitcast to int32 (no value conversion)."""
    return lax.bitcast_convert_type(x, jnp.int32)


def u32(x):
    """Bitcast to uint32 (no value conversion)."""
    return lax.bitcast_convert_type(x, jnp.uint32)


def umul32_wide(a, b):
    """Full 64-bit product of two uint32 arrays, as a (hi, lo) uint32 pair.

    Uses four 16x16->32 partial products with explicit carry propagation.
    """
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16

    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi

    # Middle column: carries from ll plus the low halves of the cross terms.
    # Max value 3*(2^16-1) + (2^16-1) fits comfortably in uint32.
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    lo = (mid << 16) | (ll & _MASK16)
    return hi, lo


def smul32_wide(a, b):
    """Full signed 64-bit product of two int32 arrays -> (hi, lo) uint32 pair.

    hi holds the bit pattern of the signed high word (two's complement).
    Uses the standard unsigned-product-plus-correction identity:
    hi_s = hi_u - (a<0 ? b_u : 0) - (b<0 ? a_u : 0)  (mod 2^32).
    """
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    au = u32(a)
    bu = u32(b)
    hi, lo = umul32_wide(au, bu)
    zero = jnp.zeros_like(hi)
    hi = hi - jnp.where(a < 0, bu, zero) - jnp.where(b < 0, au, zero)
    return hi, lo


def smul32_wide_const(a, b: int):
    """Signed 64-bit product of an int32 array and a *static* int32 constant.

    Avoids bitcasting scalars (unsupported by Mosaic) and resolves the
    constant's sign correction at trace time.
    """
    assert isinstance(b, int) and -(2**31) <= b < 2**31
    a = jnp.asarray(a, jnp.int32)
    au = u32(a)
    bu = jnp.uint32(b & 0xFFFFFFFF)
    hi, lo = umul32_wide(au, bu)
    hi = hi - jnp.where(a < 0, bu, jnp.uint32(0))
    if b < 0:
        hi = hi - au
    return hi, lo


def add64(hi_a, lo_a, hi_b, lo_b):
    """64-bit addition of (hi, lo) uint32 pairs with carry propagation."""
    lo = lo_a + lo_b
    carry = (lo < lo_a).astype(jnp.uint32)
    hi = hi_a + hi_b + carry
    return hi, lo


def add64_scalar(hi, lo, value):
    """Add a static non-negative Python int (< 2^64) to a (hi, lo) pair."""
    v_hi = (value >> 32) & 0xFFFFFFFF
    v_lo = value & 0xFFFFFFFF
    new_lo = lo + jnp.uint32(v_lo)
    carry = (new_lo < lo).astype(jnp.uint32) if v_lo else jnp.zeros_like(lo)
    new_hi = hi + jnp.uint32(v_hi) + carry
    return new_hi, new_lo


def sub64_one_where(hi, lo, cond):
    """Subtract 1 from (hi, lo) where `cond` holds (64-bit add of -1)."""
    minus1 = jnp.where(cond, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    return add64(hi, lo, minus1, minus1)


def shr64_lo32(hi, lo, n: int):
    """Low 32 bits of a logical 64-bit right shift by static n in [0, 64)."""
    if n == 0:
        return lo
    if n < 32:
        return (lo >> n) | (hi << (32 - n))
    if n == 32:
        return hi
    return hi >> (n - 32)


def asr64_lo32(hi, lo, n: int):
    """Low 32 bits of an arithmetic 64-bit right shift by static n in [0, 64).

    `hi` holds the two's-complement bit pattern of the signed high word.
    Only valid when the true shifted result fits in 32 bits (which every
    requantization contract guarantees).
    """
    if n == 0:
        return lo
    if n < 32:
        return (lo >> n) | (hi << (32 - n))
    if n == 32:
        return hi
    return u32(i32(hi) >> (n - 32))


def asr_s32(x, n):
    """Arithmetic shift right of int32 (mirrors scalar-utils.h asr_s32)."""
    return jnp.asarray(x, jnp.int32) >> n


def neg_u32(x):
    """Two's-complement negation in uint32 arithmetic."""
    return jnp.uint32(0) - jnp.asarray(x, jnp.uint32)


def abs_u32(x):
    """|x| of an int32 array as uint32 (INT32_MIN maps to 0x80000000).

    Mirrors precise-scalar.c:53: (x >= 0) ? (uint32_t) x : -(uint32_t) x.
    """
    x = jnp.asarray(x, jnp.int32)
    xu = u32(x)
    return jnp.where(x >= 0, xu, neg_u32(xu))


def u32_barrett_magic(s):
    """m = floor(2^32 / s) for uint32 s >= 1, without 64-bit arithmetic.

    floor(2^32/s) = floor((2^32-1)/s) + [s divides 2^32].  One hardware
    division per element of `s` - intended for per-ROW divisors (softmax
    sums), where the cost amortizes over the row.
    """
    s = jnp.asarray(s, jnp.uint32)
    q = jnp.uint32(0xFFFFFFFF) // s
    r = jnp.uint32(0xFFFFFFFF) - q * s
    return q + (r == s - 1).astype(jnp.uint32)


def u32_div_floor(n, s, m):
    """Exact floor(n / s) for uint32 n with precomputed m = barrett magic.

    Barrett reduction: q0 = mulhi(n, m) underestimates the true quotient
    by at most 2 (classic bound for m = floor(2^32/s), n < 2^32), so two
    conditional correction steps make it exact.  ~20 VPU lane-ops per
    element vs ~57 for the hardware u32 divide (measured v5e 2026-08-21,
    BENCH_MODELS.json bert note) - the win when the divisor is shared
    across a row.  Requires s >= 1.
    """
    n = jnp.asarray(n, jnp.uint32)
    q0, _ = umul32_wide(n, m)          # hi word = floor(n*m / 2^32)
    # d = n - q0*s is exact in uint32: 0 <= d < 3s and d <= n < 2^32.
    d = n - q0 * s
    c1 = (d >= s).astype(jnp.uint32)
    d1 = d - s * c1
    c2 = (d1 >= s).astype(jnp.uint32)
    # s == 1 is the one divisor whose magic (2^32) does not fit uint32.
    return jnp.where(s == 1, n, q0 + c1 + c2)
