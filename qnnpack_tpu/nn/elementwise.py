"""Quantized elementwise operators: add, clamp, LUT ops, softargmax, shuffle.

TPU-native replacements for the reference's q8vadd / u8clamp / x8lut /
u8rmax+u8lut32norm / x8zip microkernel families.  LUT construction mirrors
the reference bit for bit (host-side float32/double math); LUT application
is a one-hot dot against the 256-entry table (see _lut256) - the
MXU-native lowering of a byte gather.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..quant.params import AddQuantParams, ClampParams
from ..quant.requantize import add_quantize, clamp_u8  # noqa: F401  (re-export)


def _lut256(table, x_u8):
    """256-entry table lookup as a one-hot dot - the TPU-native lowering.

    `jnp.take` lowers to an XLA gather, which the TPU backend executes as a
    serialized dynamic-slice loop: measured 1618 us for a [1,12,128,128]
    lookup on v5e (2026-08-21) vs 104 us for the identical math as
    onehot(x) @ table - a 15.6x win, verified bit-exact on-chip over random
    tables.  uint8 tables ride the int8 MXU path via a -128 bias (one-hot
    rows sum to exactly 1, so the bias adds back as +128).  uint32 tables
    (softargmax exp LUT) use an f32 matmul: every entry is an integer
    <= 2^23 (qscale cap, softargmax.c:86-91), and 0/1 one-hot rows select a
    single f32-exact term, so the product is exact - PROVIDED the dot runs
    at true f32 precision.  The TPU backend's DEFAULT matmul precision for
    f32 operands is reduced-precision bf16 passes whose 8-bit mantissa
    cannot hold 2^23-scale integers, so the f32 dots pin
    precision=HIGHEST explicitly (exact for 0/1 one-hot selection);
    bit-exactness over all 256 indices is pinned on-chip by
    tests/test_onhw_smoke.py::test_lut_onehot_bit_exact.
    """
    idx = jnp.asarray(x_u8, jnp.uint8).astype(jnp.int32)
    onehot_dims = (((idx.ndim,), (0,)), ((), ()))
    if table.dtype == np.uint8:
        lt = (jnp.asarray(table, jnp.int32) - 128).astype(jnp.int8)
        oh = (idx[..., None]
              == jnp.arange(256, dtype=jnp.int32)).astype(jnp.int8)
        acc = jax.lax.dot_general(oh, lt[:, None], onehot_dims,
                                  preferred_element_type=jnp.int32)
        return (acc[..., 0] + 128).astype(jnp.uint8)
    # u32 entries are f32-exact by construction: build_softargmax_lut caps
    # qscale at 2^23 (softargmax.c:86) so every entry is an integer < 2^24.
    lt = jnp.asarray(table, jnp.uint32).astype(jnp.float32)
    oh = (idx[..., None]
          == jnp.arange(256, dtype=jnp.int32)).astype(jnp.float32)
    acc = jax.lax.dot_general(oh, lt[:, None], onehot_dims,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return acc[..., 0].astype(jnp.uint32)


def build_sigmoid_lut(input_zero_point: int, input_scale: float,
                      output_min: int = 0, output_max: int = 255) -> np.ndarray:
    """256-entry uint8 sigmoid table (sigmoid.c:95-110).

    Requires output scale 1/256 and output zero point 0 (enforced by the
    operator layer, sigmoid.c:67-79)."""
    i = np.arange(256, dtype=np.int32)
    x = np.float32(input_scale) * (i - int(input_zero_point)).astype(np.float32)
    scaled = np.float32(256.0) / (np.float32(1.0) + np.exp(-x, dtype=np.float32))
    scaled = np.clip(scaled, np.float32(output_min), np.float32(output_max))
    return np.rint(scaled).astype(np.uint8)


def build_leaky_relu_lut(input_zero_point: int, input_output_scale: float,
                         negative_slope: float, output_zero_point: int,
                         output_min: int = 0, output_max: int = 255) -> np.ndarray:
    """256-entry uint8 leaky-ReLU table (leaky-relu.c:104-117)."""
    i = np.arange(256, dtype=np.int32)
    x = np.float32(input_output_scale) * (i - int(input_zero_point)).astype(np.float32)
    y = np.where(x < 0, x * np.float32(negative_slope), x).astype(np.float32)
    lo = np.float32(int(output_min) - int(output_zero_point))
    hi = np.float32(int(output_max) - int(output_zero_point))
    y = np.clip(y, lo, hi)
    return (np.rint(y).astype(np.int64) + int(output_zero_point)).astype(np.uint8)


def build_softargmax_lut(input_scale: float, channels: int) -> np.ndarray:
    """256-entry uint32 exp table (softargmax.c:86-91, double math)."""
    qscale = min(float(np.iinfo(np.uint32).max) / float(channels), 8388607.0)
    i = np.arange(256, dtype=np.int64)
    scaled = qscale * np.exp((i - 255).astype(np.float64) * float(input_scale))
    return np.rint(scaled).astype(np.uint64).astype(np.uint32)


def x8lut(x_u8, lut):
    """Byte-wise table lookup (x8lut ukernel analogue, src/x8lut/scalar.c)."""
    return _lut256(jnp.asarray(lut, jnp.uint8), x_u8)


def build_softargmax_lut_factored(input_scale: float, channels: int):
    """Factor the 256-entry exp LUT into two 16-entry f32 tables plus a
    sparse exact-correction list - an 8x cheaper device lookup.

    STATUS (round 5): still the production path - the bilinear 16x16
    form (_lut_t16) removes the preconditions but measured 0.79x of this
    chain on the b128 BERT scores (BENCH_BERT_BOUND.json), so it serves
    as the fallback when this factorization declines.

    The table is geometric up to rounding: t[16h + l] = rint(qscale *
    exp((16h - 255)s) * exp(l s)) ~= rint(F[h] * G[l]).  The device
    computes rint_f32(F[hi] * G[lo]) with two 16-wide one-hot dots (32
    lane-ops/element vs 256 for the full one-hot) and adds the exact
    integer correction D[i] = t[i] - rint_f32(F[h] * G[l]) for the few
    indices where f32 product rounding disagrees with the f64 table build.
    f32 multiply and rint are IEEE-deterministic across numpy and the TPU
    VPU, so D computed here equals the device's residual exactly and the
    result is bit-identical to the plain LUT path.

    Returns (lut_u32, F, G, corrections) where corrections is a static
    tuple of (index, delta); or (lut_u32, None, None, None) when the
    factorization is unprofitable (many corrections) or risks subnormal
    f32 products (TPU flushes subnormals, numpy does not).
    """
    t = build_softargmax_lut(input_scale, channels)
    s = float(input_scale)
    qscale = min(float(np.iinfo(np.uint32).max) / float(channels), 8388607.0)
    h = np.arange(16, dtype=np.float64)
    F = (qscale * np.exp((16.0 * h - 255.0) * s)).astype(np.float32)
    G = np.exp(h * s).astype(np.float32)
    if float(F.min()) < 1e-30:  # subnormal-product risk: TPU flushes them
        return t, None, None, None
    pred = np.rint(F[:, None] * G[None, :]).astype(np.int64).ravel()
    d = t.astype(np.int64) - pred
    nz = np.nonzero(d)[0]
    if len(nz) > 24 or (len(nz) and np.abs(d[nz]).max() > 3):
        return t, None, None, None
    corr = tuple((int(i), int(d[i])) for i in nz)
    return t, F, G, corr


def _lut_factored(idx_i32, F, G, corrections):
    """e = rint_f32(F[idx >> 4] * G[idx & 15]) + sparse corrections; bit-
    identical to _lut256 over the full table (see the builder).  The f32
    one-hot dots pin precision=HIGHEST: the host-computed correction deltas
    assume exact f32 selection, and the backend's default f32 matmul
    precision is reduced (bf16 passes)."""
    hi = idx_i32 >> 4
    lo = idx_i32 & 15
    r16 = jnp.arange(16, dtype=jnp.int32)
    dims = (((idx_i32.ndim,), (0,)), ((), ()))
    oh = (hi[..., None] == r16).astype(jnp.float32)
    ol = (lo[..., None] == r16).astype(jnp.float32)
    fv = jax.lax.dot_general(oh, jnp.asarray(F)[:, None], dims,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)[..., 0]
    gv = jax.lax.dot_general(ol, jnp.asarray(G)[:, None], dims,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)[..., 0]
    e = jnp.rint(fv * gv).astype(jnp.int32)
    for i, delta in corrections:
        e = e + jnp.int32(delta) * (idx_i32 == i).astype(jnp.int32)
    return e.astype(jnp.uint32)


def _lut_t16(idx_i32, t16_f32):
    """t[idx] as the bilinear one-hot form onehot(idx>>4) @ T16 . onehot(
    idx & 15), where T16 is the 256-entry table reshaped [16, 16].

    Exact for every reference exp table BY CONSTRUCTION: entries are
    integers <= 2^23 (the qscale cap, softargmax.c:86-91, applies at every
    channel count), each is f32-exact, and 0/1 one-hot selection is exact
    at precision=HIGHEST.  Role (measured v5e 2026-08-21,
    BENCH_BERT_BOUND.json): the PRECONDITIONS-FREE fallback - on the b128
    BERT score tensor it runs 2.92 ms vs the factored chain's 2.31
    (0.79x: the [M, 16] intermediate row it materializes costs more than
    the <= 24-entry correction list it removes), so the factored path
    stays production where its factorization holds, and this form
    replaces the 4.7x-slower 256-wide one-hot (_lut256: 13.63 ms on the
    same tensor) everywhere the factorization declines."""
    hi = idx_i32 >> 4
    lo = idx_i32 & 15
    r16 = jnp.arange(16, dtype=jnp.int32)
    dims = (((idx_i32.ndim,), (0,)), ((), ()))
    oh = (hi[..., None] == r16).astype(jnp.float32)
    ol = (lo[..., None] == r16).astype(jnp.float32)
    rows = jax.lax.dot_general(oh, t16_f32, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(rows * ol, axis=-1).astype(jnp.uint32)


def u8softargmax(x_u8, lut_u32, factored=None):
    """Quantized softmax over the last axis (compute_u8softargmax,
    operator-run.c:625-637 + u8lut32norm/scalar.c).

    Per row: m = max(x); e[i] = t[x[i] + 255 - m] (numerically-stable offset,
    the reference's `t + (rmax ^ 255)` table shift); sum = sum e;
    y[i] = min((e[i] * 256 + sum/2) / sum, 255).

    `factored`: optional (F, G, corrections) from
    build_softargmax_lut_factored - the measured-fastest exact lookup
    (production where available); without it the bilinear 16x16 one-hot
    form (_lut_t16) applies, exact for every reference table with no
    preconditions."""
    x = jnp.asarray(x_u8, jnp.uint8).astype(jnp.int32)
    t = jnp.asarray(lut_u32, jnp.uint32)
    rmax = jnp.max(x, axis=-1, keepdims=True)
    idx = x + (255 - rmax)
    if factored is not None and factored[0] is not None:
        e = _lut_factored(idx, *factored)
    else:
        e = _lut_t16(idx, t.astype(jnp.float32).reshape(16, 16))
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.uint32)
    # Exact uint32 floor division via per-row Barrett reciprocal: the
    # divisor is shared across the row, so one hardware divide per row
    # (the magic) replaces a ~57-lane-op vector divide per ELEMENT with a
    # ~20-lane-op multiply-high + 2-step correction (int_arith.
    # u32_div_floor, exactness proven over the full uint32 domain in
    # tests).  Measured 1.48 -> ~0.5 ms on the b128 BERT score tensor.
    from ..quant.int_arith import u32_barrett_magic, u32_div_floor
    q = u32_div_floor(e * jnp.uint32(256) + (s >> 1), s,
                      u32_barrett_magic(s))
    return jnp.minimum(q, jnp.uint32(255)).astype(jnp.uint8)


def x8zip(x_u8, groups: int):
    """Channel shuffle (x8zip x2/x3/x4/xm analogue, src/x8zip/).

    [..., groups * k] with group-major layout -> interleaved: out channel
    g + k_idx * groups takes input channel g * k + k_idx  (channel-shuffle
    operator semantics, src/channel-shuffle.c + operator-run.c:1120-1141)."""
    x = jnp.asarray(x_u8, jnp.uint8)
    *lead, c = x.shape
    assert c % groups == 0, "channels must be divisible by groups"
    k = c // groups
    return jnp.swapaxes(x.reshape(*lead, groups, k), -1, -2).reshape(*lead, c)
