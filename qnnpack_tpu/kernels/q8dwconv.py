"""Pallas TPU depthwise-convolution kernel (VPU path).

The TPU-native replacement for the reference's q8dwconv microkernel family
(src/q8dwconv/up8x9-neon.c 3x3 unipass, mp8x25-neon.c 5x5 multipass, selected
at init.c:85-92 with cr=8 channel blocks).  Depthwise conv has one filter tap
per channel - no channel contraction - so it is vector (VPU) work, not MXU
work; a naive matmul lowering wastes the systolic array (SURVEY.md 7.4 #6).

Design (no indirection buffers, no pointer tables - SURVEY.md 7.1):

  1. The input is padded spatially with the *biased input zero point* so
     padded taps contribute exactly zero (the reference's zero-buffer trick,
     src/convolution.c:330-339).
  2. Strides are turned into unit-stride accesses by a space-to-batch
     transform: the padded input is split into sh*sw phase planes, so tap
     (ky, kx) reads phase ((ky*dh) % sh, (kx*dw) % sw) at a static unit-stride
     offset.  This replaces the reference's strided indirection rows
     (src/indirection.c:81-132) with a layout XLA materializes once.
  3. Output rows are tiled; each tile's input rows are gathered with their
     halo (th = ty + max tap offset) so Pallas block specs stay
     non-overlapping.  This mirrors the reference's per-output-row task split
     (operator-run.c:675-679) with the halo made explicit.
  4. In-kernel: int32 multiply-accumulate over the Kh*Kw taps (statically
     unrolled), with weights pre-shifted by the kernel zero point
     (wd = w' - zw'), then the fused requantization epilogue - int32 never
     touches HBM, like the reference's in-kernel requantization.

The kernel-zero-point algebra: acc = sum_t A'_t * (W'_t - zw') + bias_fold,
where bias_fold = bias - za' * sum(W' - zw') equals the packed bias produced
by nn.conv.pack_conv_weights (same identity as pack.h:24-43).

STATUS (2026-08-21 round 5, BENCH_DWCONV_WINDOW.json): RETIRED from
routing entirely (TuneParams.dwconv_pallas_strided False).  The round-1
strided win window (isolated 1.2-8.3x, re-confirmed this round) is an
ISOLATED-PROGRAM phenomenon: inside a full jitted model XLA never hits
its collapse lowering, and end-to-end the window measures 0.70x
(imported per-channel MobileNetV2 b1) to 1.00x (zoo b1/b8) - never a
win - so production routing follows e2e.  The b128 regime was already
retired in round 4 (BENCH_DWCONV_B128.json: loses 3-9x, VPU MAC loop
compute-bound; MXU-diagonal alternative modeled tie at best).
Per-channel requantization is fully plumbed (scale vector as a
BlockSpec'd input sliced per channel tile, bit-exact in
tests/test_kernels_pallas.py), so a future re-enable covers imported
models too.  The kernel remains the bit-exactness cross-check for the
dwconv contract.
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


def _dwconv_kernel(a_ref, wd_ref, bias_ref, out_ref, *, rparams,
                   taps, ty: int, wo: int, scale_ref=None):
    """One (batch, row-tile, channel-tile) block.

    a_ref:    [1, sh, sw, 1, th, wc, tc] biased int8 phase planes with halo
    wd_ref:   [kh*kw, 1, tc] int32 zero-point-shifted weights
    bias_ref: [1, tc] int32 folded bias
    scale_ref: optional [1, tc] f32 per-channel requant scales (sliced per
              channel tile by its own BlockSpec - the plumbing that
              previously excluded per-channel models from this kernel's
              measured 5-9x strided window, VERDICT r4 missing #4)
    out_ref:  [1, ty, wo, tc] uint8
    taps:     static tuple of (tap_index, phase_h, phase_w, off_h, off_w)
    """
    acc = jnp.broadcast_to(bias_ref[0][None, None, :],
                           (ty, wo, bias_ref.shape[1])).astype(jnp.int32)
    for t, ph, pw, oh, ow in taps:
        a = a_ref[0, ph, pw, 0, oh:oh + ty, ow:ow + wo, :].astype(jnp.int32)
        acc = acc + a * wd_ref[t]
    if scale_ref is None:
        out_ref[0] = apply_requant(acc, rparams)
    else:
        from .q8gemm_small import _epilogue_per_channel
        out_ref[0] = _epilogue_per_channel(
            acc, scale_ref[0][None, None, :], rparams.zero_point,
            rparams.qmin, rparams.qmax)


@functools.partial(jax.jit, static_argnames=(
    "strides", "padding", "dilation", "rparams", "tile_h", "tile_c",
    "interpret"))
def q8dwconv_pallas(a_u8, packed: PackedConvWeights, rparams,
                    strides=(1, 1), padding=((0, 0), (0, 0)),
                    dilation=(1, 1), *, tile_h: int = 8, tile_c: int = 128,
                    interpret: bool = False):
    """Quantized depthwise conv: uint8 NHWC -> uint8 NHWC on the VPU.

    Bit-identical to nn.conv.q8conv2d with groups == channels (and therefore
    to the reference q8dwconv contract).
    """
    assert packed.group_input_channels == 1 and \
        packed.group_output_channels == 1, "depthwise requires 1 ch/group"
    c = packed.groups
    kh, kw = packed.kernel_height, packed.kernel_width
    sh, sw = strides
    dh, dw = dilation
    b, h, w, ca = a_u8.shape
    assert ca == c, f"channels {ca} != groups {c}"

    (pt, pb), (pl_, pr) = padding
    ho = (h + pt + pb - ((kh - 1) * dh + 1)) // sh + 1
    wo = (w + pl_ + pr - ((kw - 1) * dw + 1)) // sw + 1

    izp = packed.izp_biased
    a = u8_to_biased_i8(a_u8)

    # Host-side layout (XLA, one materialization): zero-point pad, phase
    # split, halo row tiles - see kernels/_layout.py.
    ty = min(tile_h, ho)
    a, n_ht, th, wc = phase_halo_tiles(
        a, kh, kw, strides, dilation, padding, ho, wo, ty, izp)

    tc = min(tile_c, round_up(c, 128))
    a = pad_to_multiple(a, 6, tc)
    cp = a.shape[6]
    n_ct = cp // tc

    # Weights: HWIO [kh, kw, 1, C] -> zero-point-shifted int32 [kh*kw, 1, Cp].
    wd = packed.w.reshape(kh * kw, c).astype(jnp.int32) - packed.kzp_biased
    wd = pad_to_multiple(wd[:, None, :], 2, tc)
    bias = pad_to_multiple(packed.bias_folded[None, :], 1, tc)

    taps = make_taps(kh, kw, strides, dilation)

    from ..quant.params import PerChannelFP32Params
    per_channel = isinstance(rparams, PerChannelFP32Params)
    in_specs = [
        pl.BlockSpec((1, sh, sw, 1, th, wc, tc),
                     lambda bi, i, ci: (bi, 0, 0, i, 0, 0, ci)),
        pl.BlockSpec((kh * kw, 1, tc), lambda bi, i, ci: (0, 0, ci)),
        pl.BlockSpec((1, tc), lambda bi, i, ci: (0, ci)),
    ]
    args = [a, wd, bias]
    kern = functools.partial(_dwconv_kernel, rparams=rparams, taps=taps,
                             ty=ty, wo=wo)
    if per_channel:
        import numpy as np
        scale = pad_to_multiple(
            jnp.asarray(np.asarray(rparams.scales, np.float32))[None, :],
            1, tc)
        in_specs.append(pl.BlockSpec((1, tc), lambda bi, i, ci: (0, ci)))
        args.append(scale)

        def kern(a_ref, wd_ref, bias_ref, scale_ref, out_ref):
            _dwconv_kernel(a_ref, wd_ref, bias_ref, out_ref, rparams=rparams,
                           taps=taps, ty=ty, wo=wo, scale_ref=scale_ref)

    out = pl.pallas_call(
        kern,
        grid=(b, n_ht, n_ct),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ty, wo, tc),
                               lambda bi, i, ci: (bi, i, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n_ht * ty, wo, cp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * c * kh * kw,
            bytes_accessed=b * h * w * c + b * ho * wo * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :ho, :, :c]
