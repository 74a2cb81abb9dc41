"""Pallas TPU kernel for CNN stem convolutions (stride-2, C_in <= 4).

The universal first layer of every model in the reference's benchmark
table (bench/convolution.cc:108-962) is a stride-2 convolution from 3
image channels - 7x7/64 (ResNet, bench/convolution.cc:642), 7x7/96
(SqueezeNet 1.0, :539), 3x3/24-32 (MobileNets/ShuffleNets, :108/:428).
On TPU this shape is the worst case for a generic conv lowering: with
C_in = 3 the contraction depth is 3, so the MXU runs ~2% occupied and the
op becomes a badly-pipelined data-movement problem.  Measured on v5e
(BENCH_STEM.json): XLA holds the class at 31-44% of its HBM roofline
under every formulation tried - native, and being handed the
space-to-depth-packed form at four channel paddings (resnet stem 591 us
native / 614 us packed vs a 186 us roofline).

This kernel restructures the conv as per-tap MXU dots over the
space-to-depth layout (nn/conv._stem_space_to_depth):

  1. XLA-side layout (cheap - the input is only 19 MB at b128): zero-point
     pad, pad C to 4, pack 2x2 spatial phases into channels ->
     [B, H/2, W/2, CP=16]; the conv becomes stride-1 with kernel
     [kh2, kw2] = [ceil((k+1)/2), ...]; rows pre-tiled with kh2-1 halo.
  2. In-kernel, each of the kh2*kw2 taps is a contiguous shifted slice
     [ty, wo, CP] dotted against its [CP, O] weight plane, accumulated in
     int32; the requant epilogue (per-tensor or per-channel) runs
     in-register and the uint8 tile is the only HBM write.

Requires kernel_zero_point == 128 (biased 0): the row-sum correction
term vanishes (TFLite full-int8 exports use symmetric weights, and the
zoo uses KERNEL_ZP = 128).

STATUS (measured 2026-08-21, BENCH_STEM.json): RETIRED, bench/cross-check
only - this kernel loses to XLA's native lowering 4-10x (resnet stem b128
4,522 vs 589 us) and every alternative formulation is either slower or
un-compilable: the strip-residue design needs a lane->sublane reshape
Mosaic rejects; assembling the im2col K dimension needs strided lane
slices or sub-128-lane concatenation, both of which fail to legalize
(probed standalone); padding the block to 128 lanes in VMEM measured
worse still (5,645 us); the XLA-level space-to-depth repack ties native
at best (614 vs 591 us at cpad=4).  The class's 32-44% of analytic
roofline therefore stands as the backend frontier, and
TuneParams.conv_stem_pallas is False everywhere.  Kept bit-exact against
the conv contract by tests/test_kernels_pallas.py as the restart point
if a future Mosaic legalizes lane assembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.conv import PackedConvWeights, _pad_input
from ..nn.dtypes import u8_to_biased_i8
from ..nn.packing import round_up
from ..nn.requant_dispatch import apply_requant
from ..quant.params import PerChannelFP32Params
from .q8gemm_small import _epilogue_per_channel

C4 = 4  # packed channel quantum (C_in padded here, then 4 phases -> CP=16)


def _kernel(a_ref, w_ref, bias_ref, out_ref, *, rparams, ty: int, wo: int,
            kh2: int, kw2: int, scale_ref=None):
    """One (batch, row-tile) block - per-tap MXU dots over contiguous
    shifted slices (Mosaic legality note: strided slices and lane-dim
    concatenation of sub-128-lane pieces both fail to legalize/compile on
    this backend - probed 2026-08-21 - so the im2col stays implicit as
    kh2*kw2 accumulated K=CP dots; the MXU pads K to 128 either way, so a
    single assembled K=kh2*kw2*CP dot would cut compute up to 2-8x if a
    future Mosaic supports the concat).

    a_ref:    [1, 1, th, w2p, CP] biased int8 packed rows (th = ty+kh2-1)
    w_ref:    [kh2, kw2, CP, O] biased int8 phase-packed weights
    bias_ref: [1, O] int32 folded bias
    out_ref:  [1, 1, ty, wo, O] uint8
    """
    rows = a_ref[0, 0]
    cp = rows.shape[-1]
    o = w_ref.shape[-1]
    # Collapse (ty, wo) -> M before the dot (minor dim untouched, so the
    # merge is legal).  Measured identical to the 3-D batched form on chip
    # (BENCH_STEM.json pallas_per_tap rows: the compiler emits the same
    # schedule) - the 16-lane operand layout, not the dot shape, is what
    # keeps this kernel behind XLA.
    acc = jnp.zeros((ty * wo, o), jnp.int32)
    for a_i in range(kh2):
        for b in range(kw2):
            p = lax.slice(rows, (a_i, b, 0), (a_i + ty, b + wo, cp))
            acc = acc + lax.dot_general(
                p.reshape(ty * wo, cp), w_ref[a_i, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    acc = acc.reshape(ty, wo, o) + bias_ref[0][None, None, :]
    if scale_ref is None:
        out_ref[0, 0] = apply_requant(acc, rparams)
    else:
        out_ref[0, 0] = _epilogue_per_channel(
            acc, scale_ref[0][None, None, :], rparams.zero_point,
            rparams.qmin, rparams.qmax)


@functools.partial(jax.jit, static_argnames=("padding", "rparams", "tile_h",
                                             "interpret"))
def q8stem_pallas(a_u8, packed: PackedConvWeights, rparams,
                  padding=((0, 0), (0, 0)), *, tile_h: int = 32,
                  interpret: bool = False):
    """Quantized stride-2 stem conv: uint8 NHWC -> uint8 NHWC.

    Bit-identical to nn.conv.q8conv2d for kernel_zero_point == 128
    (enforced), per-tensor or per-channel requantization.
    """
    assert packed.groups == 1 and packed.kzp_biased == 0
    c = packed.group_input_channels
    o = packed.group_output_channels
    kh, kw = packed.kernel_height, packed.kernel_width
    assert c <= C4, f"stem kernel is the C_in <= {C4} path, got {c}"
    b, h, w_, ca = a_u8.shape
    (pt, pb), (pl_, pr) = padding
    ho = (h + pt + pb - kh) // 2 + 1
    wo = (w_ + pl_ + pr - kw) // 2 + 1
    kh2, kw2 = (kh + 1) // 2, (kw + 1) // 2
    cp = 4 * C4

    # --- XLA-side layout: pad, phase-pack, halo row tiles ---------------
    a = _pad_input(u8_to_biased_i8(a_u8), padding, packed.izp_biased)
    hp, wp = a.shape[1], a.shape[2]
    # Channel + even-size padding contribute 0 (zero values x zero weights
    # / positions sliced off); biased-domain 0 keeps the math exact.
    w2p = wo + kw2 - 1
    ty = min(tile_h, round_up(-(-ho // max(1, -(-ho // tile_h))), 8))
    nt = -(-ho // ty)
    h2p = nt * ty + kh2 - 1
    a = jnp.pad(a, ((0, 0), (0, 2 * h2p - hp), (0, 2 * w2p - wp),
                    (0, C4 - c)))
    a2 = (a.reshape(b, h2p, 2, w2p, 2, C4)
          .transpose(0, 1, 3, 2, 4, 5).reshape(b, h2p, w2p, cp))
    th = ty + kh2 - 1
    tiles = jnp.stack([a2[:, i * ty:i * ty + th] for i in range(nt)], 1)

    # Weights [Kh, Kw, C, O] -> phase-packed taps [kh2, kw2, CP, O].
    wk = jnp.pad(packed.w, ((0, 2 * kh2 - kh), (0, 2 * kw2 - kw),
                            (0, C4 - c), (0, 0)))
    w2k = (wk.reshape(kh2, 2, kw2, 2, C4, o)
           .transpose(0, 2, 1, 3, 4, 5).reshape(kh2, kw2, cp, o))
    bias = packed.bias_folded[None, :]

    per_channel = isinstance(rparams, PerChannelFP32Params)
    kern = functools.partial(_kernel, rparams=rparams, ty=ty, wo=wo,
                             kh2=kh2, kw2=kw2)
    in_specs = [
        pl.BlockSpec((1, 1, th, w2p, cp), lambda bi, i: (bi, i, 0, 0, 0)),
        pl.BlockSpec((kh2, kw2, cp, o), lambda bi, i: (0, 0, 0, 0)),
        pl.BlockSpec((1, o), lambda bi, i: (0, 0)),
    ]
    args = [tiles, w2k, bias]
    if per_channel:
        def kern(a_ref, w_ref, bias_ref, scale_ref, out_ref):
            _kernel(a_ref, w_ref, bias_ref, out_ref, rparams=rparams,
                    ty=ty, wo=wo, kh2=kh2, kw2=kw2, scale_ref=scale_ref)
        in_specs.append(pl.BlockSpec((1, o), lambda bi, i: (0, 0)))
        args.append(jnp.asarray(np.asarray(rparams.scales, np.float32)
                                )[None, :])

    out = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, ty, wo, o),
                               lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nt, ty, wo, o), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * ho * wo * o * kh * kw * c,
            bytes_accessed=b * h * w_ * c + kh * kw * c * o + b * ho * wo * o,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, nt * ty, wo, o)[:, :ho, :, :]
