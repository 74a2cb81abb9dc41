"""Quantized convolution family: general, grouped, depthwise, 1x1, transposed.

TPU-native replacement for the reference's q8conv/q8dwconv microkernels and
the indirection-buffer machinery (src/indirection.c): instead of per-pixel
pointer tables we pad the input with the (biased) input zero point - so
padded taps contribute exactly zero to the accumulator, like the reference's
zero buffer (src/convolution.c:330-339) - and lower to
`lax.conv_general_dilated` on biased int8, which XLA maps onto the MXU's
native int8 path.

Zero-point algebra (same identity as the GEMM path, nn/packing.py):

    acc = conv_s8(A', W') - zw' * S_A(pos) + bias'[o]

where A' = A - 128 (za'-padded), W' = W - 128,
bias'[o] = bias[o] - za' * sum W'[o] + count * za' * zw', and
S_A(pos) = window sum of A' - computed as a cheap channel-sum +
`reduce_window`, the fused analogue of the reference's XZP row sums.

Kernel layout: O x Kh x Kw x Icpg (uint8), matching the reference's NHWC
operator convention (include/qnnpack.h:40-66); grouped kernels stack the
groups along O.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .dtypes import biased_zero_point, u8_to_biased_i8
from .requant_dispatch import apply_requant


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "bias_folded"],
         meta_fields=["kernel_height", "kernel_width", "group_input_channels",
                      "group_output_channels", "groups", "input_zero_point",
                      "kernel_zero_point"])
@dataclasses.dataclass(frozen=True)
class PackedConvWeights:
    """Conv weights in HWIO int8 layout with folded bias.

    w:           int8 [Kh, Kw, Icpg, O] biased (value - 128)
    bias_folded: int32 [O]
    """

    w: jax.Array
    bias_folded: jax.Array
    kernel_height: int
    kernel_width: int
    group_input_channels: int
    group_output_channels: int
    groups: int
    input_zero_point: int
    kernel_zero_point: int

    @property
    def izp_biased(self) -> int:
        return biased_zero_point(self.input_zero_point)

    @property
    def kzp_biased(self) -> int:
        return biased_zero_point(self.kernel_zero_point)


def pack_conv_weights(kernel, bias, input_zero_point: int,
                      kernel_zero_point: int, groups: int = 1,
                      transposed: bool = False) -> PackedConvWeights:
    """Pack conv/deconv weights (pack_q8conv_w / pack_q8deconv_w analogue,
    pack.h:51-133).

    kernel: uint8 [O, Kh, Kw, Icpg] with O = groups * group_output_channels.
    For `transposed` (deconvolution), the kernel is spatially flipped so the
    transposed conv lowers to a regular dilated conv.
    """
    kernel = jnp.asarray(kernel, jnp.uint8)
    o, kh, kw, icpg = kernel.shape
    assert o % groups == 0, "output channels must divide evenly into groups"
    ocpg = o // groups
    if bias is None:
        bias = jnp.zeros((o,), jnp.int32)
    bias = jnp.asarray(bias, jnp.int32)

    w = u8_to_biased_i8(kernel)  # [O, Kh, Kw, Icpg]
    if transposed:
        w = w[:, ::-1, ::-1, :]
    # HWIO with groups stacked along O (lax feature_group_count convention).
    w_hwio = jnp.transpose(w, (1, 2, 3, 0))

    za = biased_zero_point(input_zero_point)
    zw = biased_zero_point(kernel_zero_point)
    count = kh * kw * icpg
    w_sums = jnp.sum(w.astype(jnp.int32), axis=(1, 2, 3))  # [O]
    bias_folded = bias - jnp.int32(za) * w_sums + jnp.int32(count * za * zw)
    return PackedConvWeights(
        w=w_hwio, bias_folded=bias_folded, kernel_height=int(kh),
        kernel_width=int(kw), group_input_channels=int(icpg),
        group_output_channels=int(ocpg), groups=int(groups),
        input_zero_point=int(input_zero_point),
        kernel_zero_point=int(kernel_zero_point))


def _pad_input(a, padding, value: int):
    """Pad NHWC spatially with a constant (the biased input zero point)."""
    (pt, pb), (pl_, pr) = padding
    if pt == pb == pl_ == pr == 0:
        return a
    return jnp.pad(a, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                   constant_values=value)


def _grouped_1x1_split(batch: int, packed, pixels: int) -> bool:
    """Measured gate for the per-group split-GEMM lowering of grouped 1x1
    at LARGE batch (above the einsum gate): groups <= max_groups AND
    spatial >= min_pixels (28x28-class layers; BENCH_GROUPED_1X1.json
    split_gemms rows)."""
    from ..config import tune_params
    tp = tune_params()
    return (batch > tp.grouped_1x1_einsum_max_batch
            and packed.groups <= tp.grouped_1x1_split_max_groups
            and pixels >= tp.grouped_1x1_split_min_pixels)


def _grouped_1x1_einsum(batch: int) -> bool:
    """Measured batch gate for the block-diag grouped-1x1 lowering (see
    q8conv2d_acc).  Applied on every backend, so CPU tests cover the
    einsum branch at small batch and the grouped-conv branch above the
    threshold (test_conv.py 1x1_g2_b_above_gate)."""
    from ..config import tune_params
    return batch <= tune_params().grouped_1x1_einsum_max_batch


def _window_sums(a_pad_i32, packed: PackedConvWeights, strides, dilation,
                 lhs_dilation=(1, 1)):
    """Per-group window sums of the (padded, biased) input: S_A [B,Ho,Wo,G]."""
    b, hp, wp, c = a_pad_i32.shape
    g = packed.groups
    ch_sums = jnp.sum(
        a_pad_i32.reshape(b, hp, wp, g, packed.group_input_channels), axis=-1)
    return lax.reduce_window(
        ch_sums, jnp.int32(0), lax.add,
        window_dimensions=(1, packed.kernel_height, packed.kernel_width, 1),
        window_strides=(1, strides[0], strides[1], 1),
        window_dilation=(1, dilation[0], dilation[1], 1),
        base_dilation=(1, lhs_dilation[0], lhs_dilation[1], 1),
        padding="VALID")


def _stem_space_to_depth(a_pad, packed: PackedConvWeights, izp: int):
    """Stride-2 small-C_in conv -> stride-1 conv over 2x2-phase-packed
    input: a_pad [B, H, W, C] and w [Kh, Kw, C, O] are reindexed so the
    packed conv reads [B, ceil(H/2), ceil(W/2), 4C] with kernel
    [ceil((Kh+1)/2), ceil((Kw+1)/2), 4C, O] at stride 1.

    Bit-exact: pure reindexing of the same integer taps - kernel positions
    beyond Kh/Kw get weight 0, which contributes exactly nothing in the
    biased domain (w' = w - zw is what the conv multiplies), and the
    zero-point epilogue's window sums are computed from the ORIGINAL
    padded input independent of this lowering.

    Why: C_in <= 4 stride-2 stems leave the MXU nearly idle - XLA runs the
    resnet18 7x7 s2 stem at 32% of its HBM roofline (PROFILE_resnet18_b128
    .md); phase packing quadruples the contraction depth and halves the
    output grid, the standard TPU stem treatment.

    STATUS as an XLA-level rewrite (measured v5e 2026-08-21,
    BENCH_STEM.json ab_xla_s2d rows): RETIRED from routing - feeding the
    packed form back to lax.conv runs at the same rate as XLA's native
    lowering (resnet stem 614 vs 591 us native; mobilenet stem 287 vs
    248), i.e. XLA's conv is equally limited on either form.  The
    transform remains the layout stage of the (also retired - see its
    STATUS) Pallas stem kernel kernels/q8stem.py; bit-exactness of the
    transform is pinned by
    tests/test_conv.py::test_stem_s2d_transform_bit_exact.
    """
    b, h, w_, c = a_pad.shape
    kh, kw = packed.kernel_height, packed.kernel_width
    kh2, kw2 = (kh + 1) // 2, (kw + 1) // 2
    # Pad spatial dims to even with the biased input zero point (extra taps
    # meet zero weights or fall outside every output window).
    a_even = jnp.pad(a_pad, ((0, 0), (0, h & 1), (0, w_ & 1), (0, 0)),
                     constant_values=jnp.int8(izp))
    h2, w2 = a_even.shape[1] // 2, a_even.shape[2] // 2
    a2 = (a_even.reshape(b, h2, 2, w2, 2, c)
          .transpose(0, 1, 3, 2, 4, 5).reshape(b, h2, w2, 4 * c))
    # Kernel: pad spatially to (2*kh2, 2*kw2) with biased-zero weights,
    # then split each spatial dim into (position, phase).
    wk = jnp.pad(packed.w, ((0, 2 * kh2 - kh), (0, 2 * kw2 - kw),
                            (0, 0), (0, 0)))
    o = wk.shape[-1]
    w2k = (wk.reshape(kh2, 2, kw2, 2, c, o)
           .transpose(0, 2, 1, 3, 4, 5).reshape(kh2, kw2, 4 * c, o))
    return a2, w2k


def _route_stem_pallas(packed: PackedConvWeights, strides, dilation,
                       batch: int, rparams) -> bool:
    """Dispatch rule for the Pallas stem kernel (kernels/q8stem.py):
    stride-2 C_in <= 4 dense convs with kernel_zero_point == 128.
    STATUS: the gate (TuneParams.conv_stem_pallas) is False on every
    generation - the kernel measured 4-10x SLOWER than XLA's native
    lowering and every alternative formulation lost or failed to compile
    (BENCH_STEM.json); the rule stays wired so a future generation can
    re-enable it from data."""
    if strides != (2, 2) or dilation != (1, 1):
        return False
    if packed.groups != 1 or packed.kernel_height * packed.kernel_width <= 1:
        return False
    if packed.kzp_biased != 0:
        return False
    import jax
    if jax.default_backend() != "tpu":
        return False
    from ..config import tune_params
    tp = tune_params()
    return (tp.conv_stem_pallas
            and packed.group_input_channels <= tp.conv_stem_s2d_max_cin)


def q8conv2d_acc(a_u8, packed: PackedConvWeights, strides=(1, 1),
                 padding=((0, 0), (0, 0)), dilation=(1, 1),
                 lhs_dilation=(1, 1)):
    """int32 conv accumulator, bit-identical to the reference's
    sum (a - za)(w - zw) + bias over the window (zero-point padding).

    `lhs_dilation` > 1 realizes transposed convolution (deconv)."""
    a = u8_to_biased_i8(a_u8)  # NHWC int8
    a_pad = _pad_input(a, padding, packed.izp_biased)

    if (packed.kernel_height == 1 and packed.kernel_width == 1
            and packed.groups > 1 and packed.group_input_channels > 1
            and strides == (1, 1) and lhs_dilation == (1, 1)
            and _grouped_1x1_split(a_u8.shape[0], packed,
                                   a_u8.shape[1] * a_u8.shape[2])):
        # Large-batch grouped 1x1 as g INDEPENDENT dense dots over channel
        # slices (slices fuse into the dots; the output concat is
        # buffer-elided).  Measured v5e 2026-08-21
        # (BENCH_GROUPED_1X1.json split_gemms + split_g48 rows): wins
        # 1.1-2.9x over feature_group_count conv at 28x28 spatial for
        # g <= 4 across b48-128, ties/loses at 14x14 b >= 96 and at g8
        # (384->96 0.70x) - gated accordingly.  e2e validated on
        # shufflenet_v1 g2/g3/g4 b128.
        g = packed.groups
        cg = packed.group_input_channels
        og = packed.group_output_channels
        wg = packed.w.reshape(cg, g, og)
        outs = []
        for gi in range(g):
            acc_g = lax.dot_general(
                a_pad[..., gi * cg:(gi + 1) * cg], wg[:, gi],
                (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            if packed.kzp_biased != 0:
                rs = jnp.sum(a_pad[..., gi * cg:(gi + 1) * cg]
                             .astype(jnp.int32), axis=-1, keepdims=True)
                acc_g = acc_g - jnp.int32(packed.kzp_biased) * rs
            outs.append(acc_g)
        acc = jnp.concatenate(outs, axis=-1)
        return acc + packed.bias_folded[None, None, None, :]

    if (packed.kernel_height == 1 and packed.kernel_width == 1
            and packed.groups > 1 and packed.group_input_channels > 1
            and strides == (1, 1) and lhs_dilation == (1, 1)
            and _grouped_1x1_einsum(a_u8.shape[0])):
        # Grouped 1x1 (the ShuffleNet group-conv shape): a block-diagonal
        # batched matmul - the group axis becomes a dot_general batch dim,
        # so each group's [*, cg] x [cg, og] block rides the MXU directly.
        # Measured e2e (BENCH_MODELS.json shufflenet_v1 rows): ~2x at
        # batch 1, but 15-23% WORSE at batch 128, so the route is gated on
        # batch (config.TuneParams.grouped_1x1_einsum_max_batch).
        bsz, hp, wp, _ = a_pad.shape
        g = packed.groups
        cg = packed.group_input_channels
        og = packed.group_output_channels
        vg = a_pad.reshape(bsz, hp, wp, g, cg)
        wg = jnp.transpose(packed.w.reshape(cg, g, og), (1, 0, 2))
        acc = lax.dot_general(vg, wg, (((4,), (1,)), ((3,), (0,))),
                              preferred_element_type=jnp.int32)
        acc = jnp.moveaxis(acc, 0, 3)  # [B, H, W, G, og]
        if packed.kzp_biased != 0:
            rs = jnp.sum(vg.astype(jnp.int32), axis=-1, keepdims=True)
            acc = acc - jnp.int32(packed.kzp_biased) * rs
        acc = acc.reshape(bsz, hp, wp, g * og)
        return acc + packed.bias_folded[None, None, None, :]

    acc = lax.conv_general_dilated(
        a_pad, packed.w,
        window_strides=strides,
        padding="VALID",
        lhs_dilation=lhs_dilation,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=packed.groups,
        preferred_element_type=jnp.int32,
    )

    zw = packed.kzp_biased
    if zw != 0:
        s_a = _window_sums(a_pad.astype(jnp.int32), packed, strides, dilation,
                           lhs_dilation)
        s_a = jnp.repeat(s_a, packed.group_output_channels, axis=-1)
        acc = acc - jnp.int32(zw) * s_a
    return acc + packed.bias_folded[None, None, None, :]


def _route_to_pallas_dwconv(packed: PackedConvWeights, strides,
                            batch: int, in_pixels: int, rparams) -> bool:
    """Dispatch rule for the phase-plane dwconv kernel.  STATUS round 5:
    the gate (TuneParams.dwconv_pallas_strided) is False everywhere - the
    isolated strided wins (1.2-8.3x re-confirmed) never materialize
    end-to-end (0.70-1.00x with the window on, BENCH_DWCONV_WINDOW.json),
    so production follows e2e.  The rule stays wired, with per-channel
    requant now admitted, for a future data-backed re-enable."""
    if packed.groups <= 1 or packed.group_input_channels != 1 or \
            packed.group_output_channels != 1:
        return False
    if max(strides) < 2:
        return False
    # Per-channel requantization is supported natively: the kernel takes
    # the scale vector as a BlockSpec'd input sliced per channel tile
    # (VERDICT r4 missing #4).
    import jax
    if jax.default_backend() != "tpu":
        return False
    from ..config import tune_params
    tp = tune_params()
    return (tp.dwconv_pallas_strided
            and in_pixels >= tp.dwconv_pallas_min_pixels
            and batch <= tp.dwconv_pallas_max_batch)


def q8conv2d(a_u8, packed: PackedConvWeights, rparams, strides=(1, 1),
             padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """Quantized 2D convolution: uint8 NHWC -> uint8 NHWC.

    Covers the reference's gemm (1x1), conv (general), grouped, and dwconv
    (groups == channels) ukernel types - the create-time kernel-type
    dispatch (convolution.c:180-189) becomes compiler specialization plus
    one measured routing rule for strided depthwise."""
    if _route_to_pallas_dwconv(packed, strides, a_u8.shape[0],
                               a_u8.shape[1] * a_u8.shape[2], rparams):
        from ..kernels.q8dwconv import q8dwconv_pallas
        return q8dwconv_pallas(a_u8, packed, rparams, strides=strides,
                               padding=padding, dilation=dilation)
    if _route_stem_pallas(packed, strides, dilation, a_u8.shape[0], rparams):
        from ..kernels.q8stem import q8stem_pallas
        return q8stem_pallas(a_u8, packed, rparams, padding=padding)
    return apply_requant(
        q8conv2d_acc(a_u8, packed, strides, padding, dilation), rparams)


def deconv_output_dims(input_size: int, padding_total: int, adjustment: int,
                       kernel: int, dilation: int, stride: int) -> int:
    """Transposed-conv output size (deconvolution.c:26-36)."""
    effective = (kernel - 1) * dilation + 1
    return stride * (input_size - 1) + adjustment + effective - padding_total


def q8deconv2d(a_u8, packed: PackedConvWeights, rparams, strides=(1, 1),
               padding=((0, 0), (0, 0)), adjustment=(0, 0), dilation=(1, 1)):
    """Quantized transposed convolution (deconvolution.c semantics).

    output[b, sy*iy - pt + dy*dil, sx*ix - pl + dx*dil, o] +=
        (a[b,iy,ix,i] - za)(w[o,dy,dx,i] - zw)

    Lowered as an lhs-dilated convolution over spatially-flipped weights
    (flip happens at pack time with transposed=True); no inverse-stride
    indirection buffer needed (indirection.c:134-190)."""
    if dilation == (1, 1) and max(strides) > 1:
        # Sub-pixel phase decomposition: the measured production lowering
        # (see _deconv_phase) - the manual-dilation fallback below scatters
        # an s^2-x larger intermediate and ran the ENet deconvs at 12-44%
        # of roofline (PROFILE_enet_seg_b128.md pre-fix).
        return _deconv_phase(a_u8, packed, rparams, strides, padding,
                             adjustment)
    kh, kw = packed.kernel_height, packed.kernel_width
    dil_h, dil_w = dilation
    eff_h, eff_w = (kh - 1) * dil_h + 1, (kw - 1) * dil_w + 1
    (pt, pb), (pl_, pr) = padding
    ah, aw = adjustment
    # lhs-dilated conv padding that realizes the transposed-conv geometry.
    pad_top = eff_h - 1 - pt
    pad_bottom = eff_h - 1 - pb + ah
    pad_left = eff_w - 1 - pl_
    pad_right = eff_w - 1 - pr + aw
    if min(pad_top, pad_bottom, pad_left, pad_right) < 0:
        raise ValueError("padding larger than effective kernel is unsupported")

    a = u8_to_biased_i8(a_u8)
    izp = packed.izp_biased
    # Dilate the input with the *biased zero point* so inserted taps
    # contribute zero, then pad and convolve.  lax's lhs_dilation inserts
    # zeros, which would be wrong for izp != 128, so dilate manually.
    b, h, w_, c = a.shape
    sy, sx = strides
    if (sy, sx) != (1, 1):
        hd = (h - 1) * sy + 1
        wd = (w_ - 1) * sx + 1
        dil = jnp.full((b, hd, wd, c), jnp.int8(izp))
        dil = dil.at[:, ::sy, ::sx, :].set(a)
        a = dil
    a_pad = _pad_input(a, ((pad_top, pad_bottom), (pad_left, pad_right)), izp)

    acc = lax.conv_general_dilated(
        a_pad, packed.w, window_strides=(1, 1), padding="VALID",
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=packed.groups, preferred_element_type=jnp.int32)

    zw = packed.kzp_biased
    if zw != 0:
        s_a = _window_sums(a_pad.astype(jnp.int32), packed, (1, 1), dilation)
        s_a = jnp.repeat(s_a, packed.group_output_channels, axis=-1)
        acc = acc - jnp.int32(zw) * s_a
    acc = acc + packed.bias_folded[None, None, None, :]
    return apply_requant(acc, rparams)


def _deconv_phase(a_u8, packed: PackedConvWeights, rparams, strides,
                  padding, adjustment):
    """Transposed conv as its sub-pixel phase decomposition.

    Each output phase (y % sy, x % sx) receives a FIXED subset of kernel
    taps, so the deconv splits into sy*sx independent stride-1 VALID convs
    with sub-kernels w[u::sy, v::sx] (tap order reversed), interleaved
    back by a transpose-reshape - no s^2-dilated intermediate, no scatter.
    This is the standard TPU lowering of strided transposed conv; the
    manual-dilation fallback in q8deconv2d measured 12-44% of roofline on
    the ENet deconvs (classifier 1.78 ms vs a 0.205 ms bound,
    PROFILE_enet_seg_b128.md pre-fix) because it streams the s^2-x
    scattered intermediate through HBM.

    Zero-point exactness: positions OUTSIDE a phase's tap set must
    contribute as if they read the input zero point ((za - za)(w - zw)
    = 0 in the reference's accumulator, realized in the fallback by
    izp-dilation).  Expanding that contribution against the biased
    weights gives a per-phase constant correction
        za' * (sum_all w' - sum_phase w')        [per output channel]
    plus, for zw != 0, the phase's window-sum term over its OWN taps and
    a za' * (count_all - count_phase) completion - all folded in below,
    so the result is bit-identical to the fallback (asserted by
    tests/test_conv.py::test_deconv2d_bit_exact across both paths).
    """
    sy, sx = strides
    kh, kw = packed.kernel_height, packed.kernel_width
    icpg = packed.group_input_channels
    og = packed.group_output_channels
    g = packed.groups
    (pt, pb), (pl_, pr) = padding
    ah, aw = adjustment
    a = u8_to_biased_i8(a_u8)
    b, h, w_, c = a.shape
    za = packed.izp_biased
    zw = packed.kzp_biased
    ho = deconv_output_dims(h, pt + pb, ah, kh, 1, sy)
    wo = deconv_output_dims(w_, pl_ + pr, aw, kw, 1, sx)

    # packed.w is spatially flipped at pack time (for the lhs-dilated
    # lowering); the phase math indexes the ORIGINAL orientation.
    w_orig = packed.w[::-1, ::-1]  # [kh, kw, icpg, g*og]
    w_all = jnp.sum(w_orig.astype(jnp.int32), axis=(0, 1, 2))  # [g*og]

    if (kh == sy and kw == sx and pt == pb == pl_ == pr == 0
            and ah == aw == 0):
        # k == s upsampling deconv (the standard decoder block): every
        # output position receives EXACTLY ONE tap, and all sy*sx phases
        # read the identical input - so the whole op is ONE 1x1-style
        # conv to phase-major channels followed by a depth-to-space
        # reshape.  Measured v5e (BENCH_DECONV.json): the per-phase form
        # below still pays sy*sx narrow-channel convs + an interleave;
        # this form is 3-5x faster on the ENet decoders.
        # W2 output layout per group: [sy, sx, og] phase-major.
        w2 = jnp.transpose(
            w_orig.reshape(kh, kw, icpg, g, og),
            (3, 0, 1, 4, 2))               # [g, sy, sx, og, icpg]
        w2 = jnp.transpose(
            w2.reshape(g, sy * sx * og, icpg), (2, 0, 1)
        ).reshape(1, 1, icpg, g * sy * sx * og)
        acc = lax.conv_general_dilated(
            a, w2, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g, preferred_element_type=jnp.int32)
        # Per-channel constants: missing-taps completion + folded bias
        # (bias tiled phase-major within each group).
        w_phase = jnp.sum(
            w_orig.astype(jnp.int32).reshape(kh * kw, icpg, g, og),
            axis=1)                        # [sy*sx, g, og]
        w_phase = jnp.transpose(w_phase, (1, 0, 2)).reshape(-1)
        w_all_t = jnp.repeat(w_all.reshape(g, og), sy * sx,
                             axis=0).reshape(-1)
        bias_t = jnp.tile(
            packed.bias_folded.reshape(g, 1, og),
            (1, sy * sx, 1)).reshape(-1)
        const = bias_t + jnp.int32(za) * (w_all_t - w_phase)
        acc = acc + const[None, None, None, :]
        if zw != 0:
            ch = jnp.sum(a.astype(jnp.int32).reshape(b, h, w_, g, icpg),
                         axis=-1)          # single-tap window sum [B,h,w,g]
            s_a = jnp.repeat(ch, sy * sx * og, axis=-1)
            s_a = s_a + jnp.int32(za) * jnp.int32((kh * kw - 1) * icpg)
            acc = acc - jnp.int32(zw) * s_a
        y = apply_requant(acc, rparams)
        if g == 1:
            # Depth-to-space with the W-interleave kept in the channel
            # dim: [sx*og] stays the minor axis through the single
            # transpose, and the final channel->width split is a free
            # row-major reshape.  One data-movement pass instead of two.
            y = y.reshape(b, h, w_, sy, sx * og)
            y = jnp.transpose(y, (0, 1, 3, 2, 4))
            y = y.reshape(b, h * sy, w_ * sx, og)
        else:
            # Grouped: the conv's g-major output layout forces the full
            # phase transpose.
            y = y.reshape(b, h, w_, g, sy, sx, og)
            y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
            y = y.reshape(b, h * sy, w_ * sx, g * og)
        return y[:, :ho, :wo, :]

    nmax = -(-ho // sy)
    mmax = -(-wo // sx)

    def phase_slices(r, s_, pad0, k, size):
        """(taps, off, pads) for one axis: output offset r, stride s_."""
        u = (r + pad0) % s_
        t_count = max(0, -(-(k - u) // s_))
        j0 = (r + pad0 - u) // s_
        return u, t_count, j0

    rows = []
    for r in range(sy):
        u, tu, j0u = phase_slices(r, sy, pt, kh, h)
        cols = []
        for q in range(sx):
            v, tv, j0v = phase_slices(q, sx, pl_, kw, w_)
            if tu == 0 or tv == 0:
                # No kernel taps reach this phase: the accumulator is the
                # pure missing-taps correction (constant per channel).
                acc_const = (packed.bias_folded + jnp.int32(za) * w_all
                             - jnp.int32(zw * za) * jnp.int32(kh * kw * icpg))
                acc = jnp.broadcast_to(acc_const[None, None, None, :],
                                       (b, nmax, mmax, g * og))
                cols.append(apply_requant(acc, rparams))
                continue
            # Sub-kernel, tap order reversed along both axes.
            ku = w_orig[u::sy][::-1]        # [tu, kw, icpg, O]
            kuv = ku[:, v::sx][:, ::-1]     # [tu, tv, icpg, O]
            offy = j0u - (tu - 1)
            offx = j0v - (tv - 1)
            padt = max(0, -offy)
            padl = max(0, -offx)
            padb = max(0, j0u + nmax - 1 - (h - 1))
            padr = max(0, j0v + mmax - 1 - (w_ - 1))
            ap = jnp.pad(a, ((0, 0), (padt, padb), (padl, padr), (0, 0)),
                         constant_values=jnp.int8(za))
            ap = lax.slice(
                ap, (0, offy + padt, offx + padl, 0),
                (b, offy + padt + nmax + tu - 1,
                 offx + padl + mmax + tv - 1, c))
            acc = lax.conv_general_dilated(
                ap, kuv, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g, preferred_element_type=jnp.int32)
            # Missing-taps completion: za' * (sum_all - sum_phase) w'.
            w_phase = jnp.sum(kuv.astype(jnp.int32), axis=(0, 1, 2))
            acc = acc + jnp.int32(za) * (w_all - w_phase)[None, None, None, :]
            if zw != 0:
                ch = jnp.sum(ap.astype(jnp.int32)
                             .reshape(b, ap.shape[1], ap.shape[2], g, icpg),
                             axis=-1)
                s_a = lax.reduce_window(
                    ch, jnp.int32(0), lax.add,
                    window_dimensions=(1, tu, tv, 1),
                    window_strides=(1, 1, 1, 1), padding="VALID")
                s_a = jnp.repeat(s_a, og, axis=-1)
                s_a = s_a + jnp.int32(za) * jnp.int32(
                    (kh * kw - tu * tv) * icpg)
                acc = acc - jnp.int32(zw) * s_a
            acc = acc + packed.bias_folded[None, None, None, :]
            cols.append(apply_requant(acc, rparams))
        rows.append(jnp.stack(cols, axis=3))  # [B, nmax, mmax, sx, O]
    out = jnp.stack(rows, axis=2)             # [B, nmax, sy, mmax, sx, O]
    out = out.reshape(b, nmax * sy, mmax * sx, g * og)
    return out[:, :ho, :wo, :]
