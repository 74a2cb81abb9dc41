"""Pallas TPU general-convolution kernel (MXU implicit im2col).

The TPU-native replacement for the reference's q8conv microkernel family
(src/q8conv/4x8-neon.c, 8x8-aarch64-neon.S; ukernel contract
src/qnnpack/params.h:278-287).  Where the reference walks an indirection
pointer buffer and accumulates one kr-slice of the kernel window per step,
this kernel statically unrolls the Kh*Kw kernel positions and issues one
MXU matmul per tap over the channel dimension:

    acc[m, o] += A'[tap m-window, :] @ W'[tap, :, o]      (int8 x int8 -> int32)

with m = (output-row-tile x output-width) as the GEMM M dimension - the
implicit im2col of SURVEY.md 7.1/7.4 #2.  Input windows arrive via the same
zero-point-padded space-to-batch phase planes + halo row tiles as the
depthwise kernel (kernels/q8dwconv.py), so every in-kernel access is a
unit-stride slice.

Activation row sums (the kernel-zero-point correction, the reference's XZP
path generalization) accumulate alongside the matmuls, and the fused
requantization epilogue keeps the int32 accumulator out of HBM entirely.

STATUS (measured 2026-08-21, BENCH_KERNEL_ROUTING.json): bench-only, not
dispatched.  XLA's conv lowering wins at every measured model shape -
stem conv3x3s2 1x224x224x3->32: XLA 287 vs Pallas 127 GOPS; ResNet-body
conv3x3 8x56x56x64->64: 11,839 vs 10,430; 32x14x14x160->160: 61,183 vs
13,688 - because XLA's implicit-im2col tiling amortizes the halo reads
across output tiles better than this kernel's per-tap phase planes.  The
kernel stays as the bit-exactness cross-check for the conv contract
(tests/test_kernels_pallas.py) and as the starting point if a future shape
class shows an XLA gap.  Routing discipline per src/init.c:69-84: no
dispatch without a measured win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.conv import PackedConvWeights
from ..nn.dtypes import u8_to_biased_i8
from ..nn.packing import pad_to_multiple, round_up
from ..nn.requant_dispatch import apply_requant
from ._layout import make_taps, phase_halo_tiles


def _q8conv_kernel(a_ref, w_ref, bias_ref, out_ref, *, rparams,
                   taps, ty: int, wo: int, kzp_biased: int):
    """One (batch, row-tile, out-channel-tile) block.

    a_ref:    [1, sh, sw, 1, th, wc, cp] biased int8 phase planes with halo
    w_ref:    [kh*kw, cp, to] biased int8 weights (tap-major)
    bias_ref: [1, to] int32 folded bias
    out_ref:  [1, ty, wo, to] uint8
    """
    to = bias_ref.shape[1]
    m = ty * wo
    acc = jnp.zeros((m, to), jnp.int32)
    rs = jnp.zeros((m, 1), jnp.int32)
    for t, ph, pw, oh, ow in taps:
        a = a_ref[0, ph, pw, 0, oh:oh + ty, ow:ow + wo, :]
        a = a.reshape(m, a.shape[-1])
        acc = acc + jax.lax.dot_general(
            a, w_ref[t], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if kzp_biased != 0:
            rs = rs + jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
    acc = acc + bias_ref[0][None, :]
    if kzp_biased != 0:
        acc = acc - jnp.int32(kzp_biased) * rs
    out_ref[0] = apply_requant(acc, rparams).reshape(ty, wo, to)


@functools.partial(jax.jit, static_argnames=(
    "strides", "padding", "dilation", "rparams", "tile_h", "tile_o",
    "interpret"))
def q8conv_pallas(a_u8, packed: PackedConvWeights, rparams,
                  strides=(1, 1), padding=((0, 0), (0, 0)),
                  dilation=(1, 1), *, tile_h: int = 8, tile_o: int = 128,
                  interpret: bool = False):
    """Quantized general conv: uint8 NHWC -> uint8 NHWC on the MXU.

    Bit-identical to nn.conv.q8conv2d (groups == 1); covers the reference's
    `conv` and `gemm` (1x1) ukernel types.
    """
    assert packed.groups == 1, "q8conv_pallas is the dense-conv path"
    c = packed.group_input_channels
    o = packed.group_output_channels
    kh, kw = packed.kernel_height, packed.kernel_width
    sh, sw = strides
    dh, dw = dilation
    b, h, w, ca = a_u8.shape
    assert ca == c, f"channels {ca} != kernel input channels {c}"

    (pt, pb), (pl_, pr) = padding
    ho = (h + pt + pb - ((kh - 1) * dh + 1)) // sh + 1
    wo = (w + pl_ + pr - ((kw - 1) * dw + 1)) // sw + 1

    izp = packed.izp_biased
    a = u8_to_biased_i8(a_u8)

    # Zero-point pad + phase split + halo row tiles (kernels/_layout.py).
    ty = max(1, min(tile_h, ho, -(-128 // wo)))  # aim for M = ty*wo >= 128
    a, n_ht, th, wc = phase_halo_tiles(
        a, kh, kw, strides, dilation, padding, ho, wo, ty, izp)

    # Channel padding: zeros are exact (no dot / row-sum contribution).
    cp = round_up(c, 128)
    a = pad_to_multiple(a, 6, cp)

    # Weights HWIO [kh, kw, c, o] -> tap-major [kh*kw, cp, op].
    to = min(tile_o, round_up(o, 128))
    wgt = packed.w.reshape(kh * kw, c, o)
    wgt = pad_to_multiple(pad_to_multiple(wgt, 1, cp), 2, to)
    op = wgt.shape[2]
    bias = pad_to_multiple(packed.bias_folded[None, :], 1, to)

    taps = make_taps(kh, kw, strides, dilation)

    out = pl.pallas_call(
        functools.partial(_q8conv_kernel, rparams=rparams, taps=taps,
                          ty=ty, wo=wo, kzp_biased=packed.kzp_biased),
        grid=(b, n_ht, op // to),
        in_specs=[
            pl.BlockSpec((1, sh, sw, 1, th, wc, cp),
                         lambda bi, i, oi: (bi, 0, 0, i, 0, 0, 0)),
            pl.BlockSpec((kh * kw, cp, to), lambda bi, i, oi: (0, 0, oi)),
            pl.BlockSpec((1, to), lambda bi, i, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec((1, ty, wo, to),
                               lambda bi, i, oi: (bi, i, 0, oi)),
        out_shape=jax.ShapeDtypeStruct((b, n_ht * ty, wo, op), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * o * c * kh * kw,
            bytes_accessed=b * h * w * c + kh * kw * c * o + b * ho * wo * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, wgt, bias)
    return out[:, :ho, :, :o]
