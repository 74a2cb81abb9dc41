"""Pallas TPU pooling kernels (VPU path).

TPU-native replacements for the reference's u8maxpool (16x9p8q + sub16,
src/u8maxpool/, params.h:422-430), q8avgpool (up8x9/mp8x9p8q, src/q8avgpool/)
and q8gavgpool (up8x7/mp8x7p7q/up8xm, src/q8gavgpool/) microkernel families.
The uni-pass/multi-pass split exists to bound NEON accumulator width; on TPU
one int32 (or uint8-max) reduction over the statically-unrolled window covers
every pooling size, and the quantization epilogue runs fused before the store
(like the reference's in-kernel scalbnf/requant epilogues).

Window access uses the shared zero-point-padded phase-plane + halo layout
(kernels/_layout.py):
  - max pooling pads with 0, the uint8 minimum - max-neutral whenever the
    window holds one real pixel, which the reference's edge-clamping
    indirection guarantees (src/indirection.c:192-231);
  - average pooling pads with the input zero point so padded taps cancel
    against the bias = -izp * pool_size exactly like the reference's zero
    rows (src/average-pooling.c:166-178).

STATUS (measured 2026-08-21, BENCH_KERNEL_ROUTING.json): bench-only, not
dispatched.  XLA's reduce_window path wins or ties every measured shape:
maxpool3x3s2 64x56x56x24: XLA 249 vs Pallas 15 GB/s; avgpool7x7
64x28x28x96: 371 vs 67; gavgpool 128x49x1280: 499 vs 133; the only tie is
maxpool at 1x112x112x64 (37 vs 38 GB/s, inside dispersion).  These kernels
remain the bit-exactness cross-checks (tests/test_kernels_pallas.py).
Routing discipline per src/init.c:69-84: no dispatch without a measured
win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.dtypes import u8_to_biased_i8
from ..nn.packing import pad_to_multiple, round_up
from ..quant.params import AvgPoolQuantParams
from ..quant.requantize import avgpool_quantize
from ._layout import make_taps, phase_halo_tiles


def _maxpool_kernel(a_ref, out_ref, *, taps, ty: int, wo: int,
                    output_min: int, output_max: int):
    # Mosaic legalizes vector max only at 32 bit; the input arrives biased
    # to int8 (value - 128, the framework-wide uint8 encoding, nn/dtypes.py)
    # and each tap widens to int32 for the signed max.
    acc = jnp.full((ty, wo, a_ref.shape[-1]), jnp.int32(-128))
    for _, ph, pw, oh, ow in taps:
        a = a_ref[0, ph, pw, 0, oh:oh + ty, ow:ow + wo, :].astype(jnp.int32)
        acc = jnp.maximum(acc, a)
    acc = jnp.clip(acc + 128, output_min, output_max)
    out_ref[0] = acc.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "pool_size", "strides", "padding", "dilation", "output_min", "output_max",
    "tile_h", "tile_c", "interpret"))
def u8maxpool_pallas(x_u8, pool_size, strides=None,
                     padding=((0, 0), (0, 0)), dilation=(1, 1),
                     output_min: int = 0, output_max: int = 255, *,
                     tile_h: int = 8, tile_c: int = 128,
                     interpret: bool = False):
    """uint8 max pooling NHWC with fused clamp, bit-identical to
    nn.pool.u8maxpool2d + clamp (the reference u8maxpool contract)."""
    ph_, pw_ = pool_size
    strides = strides if strides is not None else (ph_, pw_)
    sh, sw = strides
    dh, dw = dilation
    b, h, w, c = x_u8.shape
    (pt, pb), (pl_, pr) = padding
    ho = (h + pt + pb - ((ph_ - 1) * dh + 1)) // sh + 1
    wo = (w + pl_ + pr - ((pw_ - 1) * dw + 1)) // sw + 1

    ty = min(tile_h, ho)
    a = u8_to_biased_i8(x_u8)
    a, n_ht, th, wc = phase_halo_tiles(
        a, ph_, pw_, strides, dilation, padding, ho, wo, ty, -128)
    tc = min(tile_c, round_up(c, 128))
    a = pad_to_multiple(a, 6, tc)
    cp = a.shape[6]
    taps = make_taps(ph_, pw_, strides, dilation)

    out = pl.pallas_call(
        functools.partial(_maxpool_kernel, taps=taps, ty=ty, wo=wo,
                          output_min=output_min, output_max=output_max),
        grid=(b, n_ht, cp // tc),
        in_specs=[pl.BlockSpec((1, sh, sw, 1, th, wc, tc),
                               lambda bi, i, ci: (bi, 0, 0, i, 0, 0, ci))],
        out_specs=pl.BlockSpec((1, ty, wo, tc),
                               lambda bi, i, ci: (bi, i, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n_ht * ty, wo, cp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(a)
    return out[:, :ho, :, :c]


def _avgpool_kernel(a_ref, out_ref, *, taps, ty: int, wo: int, params):
    # Input arrives biased to int8 (x - 128); each tap under-counts by 128,
    # compensated once in the accumulator init (count * 128).
    acc = jnp.full((ty, wo, a_ref.shape[-1]),
                   jnp.int32(params.bias + 128 * len(taps)))
    for _, ph, pw, oh, ow in taps:
        acc = acc + a_ref[0, ph, pw, 0, oh:oh + ty, ow:ow + wo, :] \
            .astype(jnp.int32)
    out_ref[0] = avgpool_quantize(acc, params)


@functools.partial(jax.jit, static_argnames=(
    "params", "pool_size", "strides", "padding", "tile_h", "tile_c",
    "interpret"))
def q8avgpool_pallas(x_u8, params: AvgPoolQuantParams, pool_size,
                     strides=None, padding=((0, 0), (0, 0)), *,
                     tile_h: int = 8, tile_c: int = 128,
                     interpret: bool = False):
    """Quantized average pooling NHWC -> uint8 with the fused 64-bit
    rounding epilogue, bit-identical to nn.pool.q8avgpool2d."""
    ph_, pw_ = pool_size
    strides = strides if strides is not None else (ph_, pw_)
    sh, sw = strides
    b, h, w, c = x_u8.shape
    (pt, pb), (pl_, pr) = padding
    ho = (h + pt + pb - ph_) // sh + 1
    wo = (w + pl_ + pr - pw_) // sw + 1
    izp = params.input_zero_point

    ty = min(tile_h, ho)
    a = u8_to_biased_i8(x_u8)
    a, n_ht, th, wc = phase_halo_tiles(
        a, ph_, pw_, strides, (1, 1), padding, ho, wo, ty, izp - 128)
    tc = min(tile_c, round_up(c, 128))
    a = pad_to_multiple(a, 6, tc)
    cp = a.shape[6]
    taps = make_taps(ph_, pw_, strides, (1, 1))

    out = pl.pallas_call(
        functools.partial(_avgpool_kernel, taps=taps, ty=ty, wo=wo,
                          params=params),
        grid=(b, n_ht, cp // tc),
        in_specs=[pl.BlockSpec((1, sh, sw, 1, th, wc, tc),
                               lambda bi, i, ci: (bi, 0, 0, i, 0, 0, ci))],
        out_specs=pl.BlockSpec((1, ty, wo, tc),
                               lambda bi, i, ci: (bi, i, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n_ht * ty, wo, cp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(a)
    return out[:, :ho, :, :c]


def _gavgpool_kernel(x_ref, out_ref, *, params, n_rows: int):
    # Biased-int8 input: compensate the -128 bias once per reduced row.
    acc = jnp.sum(x_ref[0].astype(jnp.int32), axis=0, keepdims=True) \
        + jnp.int32(params.bias + 128 * n_rows)
    out_ref[0] = avgpool_quantize(acc, params)


@functools.partial(jax.jit, static_argnames=("params", "tile_c", "interpret"))
def q8gavgpool_pallas(x_u8, params: AvgPoolQuantParams, *,
                      tile_c: int = 512, interpret: bool = False):
    """Quantized global average pooling NWC [B, S, C] -> [B, 1, C] uint8.

    One reduction pass per (batch, channel-tile) - the uni/multi-pass merge
    of the reference's q8gavgpool up8x7/mp8x7p7q kernels."""
    b, s, c = x_u8.shape
    x = u8_to_biased_i8(x_u8)
    tc = min(tile_c, round_up(c, 128))
    x = pad_to_multiple(x, 2, tc)
    cp = x.shape[2]

    out = pl.pallas_call(
        functools.partial(_gavgpool_kernel, params=params, n_rows=s),
        grid=(b, cp // tc),
        in_specs=[pl.BlockSpec((1, s, tc), lambda bi, ci: (bi, 0, ci))],
        out_specs=pl.BlockSpec((1, 1, tc), lambda bi, ci: (bi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, 1, cp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x)
    return out[:, 0, :c]
