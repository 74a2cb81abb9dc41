"""Convolution family tests, mirroring test/convolution.cc case coverage:
1x1, 1x1 grouped, 3x3, strided, dilated, depthwise 3x3/5x5, grouped,
asymmetric padding, and deconvolution - all bit-exact against numpy int32
reference loop nests + the Q31 oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from qnnpack_tpu.nn import (make_requant_params, pack_conv_weights, q8conv2d,
                            q8conv2d_acc, q8deconv2d)
from qnnpack_tpu.quant import oracles

import reference_ops as ref

RNG = np.random.default_rng(0xC04F)


def make_conv_case(b, h, w, c, o, kh, kw, groups=1, seed=None):
    rng = np.random.default_rng(seed) if seed is not None else RNG
    icpg = c // groups
    a = rng.integers(0, 256, (b, h, w, c), dtype=np.int64).astype(np.uint8)
    wt = rng.integers(0, 256, (o, kh, kw, icpg), dtype=np.int64).astype(np.uint8)
    bias = rng.integers(-5000, 5000, (o,), dtype=np.int64).astype(np.int32)
    return a, wt, bias


def scale_for(acc):
    spread = max(int(acc.max()) - int(acc.min()), 1)
    return min(float(np.float32(spread / 255.0)), 0.9999999), 128


CONV_CASES = [
    # (b, h, w, c, o, kh, kw, groups, strides, padding, dilation)
    ("1x1", 2, 7, 9, 16, 24, 1, 1, 1, (1, 1), ((0, 0), (0, 0)), (1, 1)),
    ("1x1_grouped", 1, 5, 5, 16, 16, 1, 1, 4, (1, 1), ((0, 0), (0, 0)), (1, 1)),
    # The next three pin the block-diag dot_general lowering of grouped
    # 1x1 (nn/conv.py q8conv2d_acc): g8, uneven og, and zero-point padding
    # flowing through the einsum path.
    ("1x1_g8", 2, 4, 6, 32, 48, 1, 1, 8, (1, 1), ((0, 0), (0, 0)), (1, 1)),
    ("1x1_g2_pad", 1, 5, 5, 6, 10, 1, 1, 2, (1, 1), ((1, 0), (0, 1)), (1, 1)),
    ("1x1_g3_stride", 1, 7, 7, 9, 12, 1, 1, 3, (2, 2), ((0, 0), (0, 0)), (1, 1)),
    # Batch above the einsum gate (32): exercises the grouped-conv branch
    # (small spatial -> below the split-GEMM pixel gate).
    ("1x1_g2_b_above_gate", 33, 2, 3, 8, 8, 1, 1, 2, (1, 1),
     ((0, 0), (0, 0)), (1, 1)),
    # Batch above the gate AND >= 28x28 spatial: the split-GEMM lowering
    # (g independent dense dots, BENCH_GROUPED_1X1.json split rows).
    ("1x1_g2_split_gemms", 33, 28, 28, 8, 10, 1, 1, 2, (1, 1),
     ((0, 0), (0, 0)), (1, 1)),
    ("1x1_g3_split_gemms", 34, 28, 28, 9, 12, 1, 1, 3, (1, 1),
     ((0, 0), (0, 0)), (1, 1)),
    # g4 joined the split window in round 5 (BENCH_GROUPED_1X1.json
    # split_g48: 28px cells win 1.6-2.9x, e2e +41% on shufflenet_v1_g4).
    ("1x1_g4_split_gemms", 33, 28, 28, 12, 16, 1, 1, 4, (1, 1),
     ((0, 0), (0, 0)), (1, 1)),
    ("3x3", 1, 8, 8, 8, 16, 3, 3, 1, (1, 1), ((1, 1), (1, 1)), (1, 1)),
    ("3x3_nopad", 1, 8, 8, 8, 16, 3, 3, 1, (1, 1), ((0, 0), (0, 0)), (1, 1)),
    ("3x3_stride2", 1, 9, 9, 8, 16, 3, 3, 1, (2, 2), ((1, 1), (1, 1)), (1, 1)),
    ("3x3_dilated", 1, 10, 10, 8, 8, 3, 3, 1, (1, 1), ((2, 2), (2, 2)), (2, 2)),
    ("asym_pad", 1, 6, 6, 4, 8, 3, 3, 1, (1, 1), ((0, 2), (1, 0)), (1, 1)),
    ("grouped_3x3", 1, 6, 6, 12, 24, 3, 3, 3, (1, 1), ((1, 1), (1, 1)), (1, 1)),
    ("dw_3x3", 1, 8, 8, 16, 16, 3, 3, 16, (1, 1), ((1, 1), (1, 1)), (1, 1)),
    ("dw_3x3_stride2", 1, 9, 9, 16, 16, 3, 3, 16, (2, 2), ((1, 1), (1, 1)), (1, 1)),
    ("dw_5x5", 1, 8, 8, 8, 8, 5, 5, 8, (1, 1), ((2, 2), (2, 2)), (1, 1)),
    ("5x5_stride3", 1, 13, 13, 4, 8, 5, 5, 1, (3, 3), ((2, 2), (2, 2)), (1, 1)),
    ("tall_kernel", 1, 9, 7, 4, 6, 5, 1, 1, (1, 1), ((2, 2), (0, 0)), (1, 1)),
    # Space-to-depth stem lowering (nn/conv._stem_space_to_depth): stride-2
    # C_in <= 4 routes through the 2x2-phase-packed stride-1 conv.  Odd
    # spatial sizes + asymmetric padding + all three zp combos pin the
    # even-padding and window-sum interplay.
    ("stem_7x7_s2", 1, 15, 14, 3, 8, 7, 7, 1, (2, 2), ((2, 3), (2, 3)), (1, 1)),
    ("stem_3x3_s2", 2, 9, 8, 3, 8, 3, 3, 1, (2, 2), ((0, 1), (0, 1)), (1, 1)),
    ("stem_2x2_s2", 1, 8, 8, 4, 8, 2, 2, 1, (2, 2), ((0, 0), (0, 0)), (1, 1)),
]


@pytest.mark.parametrize(
    "name,b,h,w,c,o,kh,kw,groups,strides,padding,dilation", CONV_CASES,
    ids=[c[0] for c in CONV_CASES])
@pytest.mark.parametrize("zps", [(121, 103), (0, 255), (128, 128)])
def test_conv2d_bit_exact(name, b, h, w, c, o, kh, kw, groups, strides,
                          padding, dilation, zps):
    a_zp, w_zp = zps
    a, wt, bias = make_conv_case(b, h, w, c, o, kh, kw, groups)
    want_acc = ref.conv2d_acc(a, wt, bias, a_zp, w_zp, strides, padding,
                              dilation, groups)
    packed = pack_conv_weights(wt, bias, a_zp, w_zp, groups)
    got_acc = np.asarray(q8conv2d_acc(jnp.asarray(a), packed, strides,
                                      padding, dilation))
    np.testing.assert_array_equal(got_acc, want_acc)

    scale, zp = scale_for(want_acc)
    rp = make_requant_params("q31", scale, zp)
    got = np.asarray(q8conv2d(jnp.asarray(a), packed, rp, strides, padding,
                              dilation))
    np.testing.assert_array_equal(got, oracles.oracle_q31(want_acc, rp))


def test_stem_s2d_transform_bit_exact():
    """The space-to-depth layout transform (the Pallas stem kernel's
    stage 1) must reindex exactly: conv over the packed form == conv over
    the original, including odd sizes, asymmetric padding, and C_in < 4."""
    import jax
    from jax import lax

    from qnnpack_tpu.nn.conv import (_pad_input, _stem_space_to_depth,
                                     q8conv2d_acc)
    from qnnpack_tpu.nn.dtypes import u8_to_biased_i8

    for (h, w, c, o, k, pad) in [(15, 14, 3, 8, 7, ((2, 3), (2, 3))),
                                 (9, 8, 3, 8, 3, ((0, 1), (0, 1))),
                                 (8, 8, 4, 8, 2, ((0, 0), (0, 0)))]:
        a, wt, bias = make_conv_case(1, h, w, c, o, k, k, 1)
        packed = pack_conv_weights(wt, bias, 121, 103)
        want = np.asarray(q8conv2d_acc(jnp.asarray(a), packed, (2, 2), pad))
        a_pad = _pad_input(u8_to_biased_i8(jnp.asarray(a)), pad,
                           packed.izp_biased)
        a2, w2k = _stem_space_to_depth(a_pad, packed, packed.izp_biased)
        oh = (a_pad.shape[1] - k) // 2 + 1
        ow = (a_pad.shape[2] - k) // 2 + 1
        acc = lax.conv_general_dilated(
            a2, w2k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)[:, :oh, :ow, :]
        # Re-apply the zero-point epilogue the acc path would (zw != 0).
        from qnnpack_tpu.nn.conv import _window_sums
        s_a = _window_sums(a_pad.astype(jnp.int32), packed, (2, 2), (1, 1))
        acc = acc - jnp.int32(packed.kzp_biased) * s_a \
            + packed.bias_folded[None, None, None, :]
        np.testing.assert_array_equal(np.asarray(acc), want)


def test_stem_pallas_route_rule():
    """Routing gate for the Pallas stem kernel: the kernel is RETIRED
    (TuneParams.conv_stem_pallas False everywhere, BENCH_STEM.json), so
    nothing may route to it; the shape preconditions stay exercised so a
    future data-backed re-enable inherits a tested rule."""
    from qnnpack_tpu.nn.conv import _route_stem_pallas
    rp = make_requant_params("fp32", 0.01, 128)
    _, wt, bias = make_conv_case(1, 15, 14, 3, 8, 7, 7, 1)
    sym = pack_conv_weights(wt, bias, 121, 128)
    asym = pack_conv_weights(wt, bias, 121, 103)
    assert not _route_stem_pallas(sym, (2, 2), (1, 1), 1, rp)  # gate off
    assert not _route_stem_pallas(asym, (2, 2), (1, 1), 1, rp)  # kzp != 128
    assert not _route_stem_pallas(sym, (1, 1), (1, 1), 1, rp)
    _, wt8, bias8 = make_conv_case(1, 9, 9, 8, 16, 3, 3, 1)
    packed8 = pack_conv_weights(wt8, bias8, 121, 128)
    assert not _route_stem_pallas(packed8, (2, 2), (1, 1), 1, rp)  # C_in > 4


DECONV_CASES = [
    ("2x2_stride2", 1, 4, 4, 8, 8, 2, 2, 1, (2, 2), ((0, 0), (0, 0)), (0, 0), (1, 1)),
    ("3x3_stride2_pad1", 1, 5, 5, 4, 8, 3, 3, 1, (2, 2), ((1, 1), (1, 1)), (0, 0), (1, 1)),
    ("3x3_stride2_adj1", 1, 5, 5, 4, 8, 3, 3, 1, (2, 2), ((1, 1), (1, 1)), (1, 1), (1, 1)),
    ("3x3_stride1", 1, 6, 6, 4, 4, 3, 3, 1, (1, 1), ((1, 1), (1, 1)), (0, 0), (1, 1)),
    ("grouped", 1, 4, 4, 8, 8, 3, 3, 2, (2, 2), ((1, 1), (1, 1)), (1, 1), (1, 1)),
    ("dilated", 1, 5, 5, 4, 4, 3, 3, 1, (1, 1), ((2, 2), (2, 2)), (0, 0), (2, 2)),
    # Phase-decomposition edges (nn/conv._deconv_phase): kernel smaller
    # than stride -> zero-tap output phases; asymmetric stride/pad mix.
    ("k_lt_stride", 1, 4, 5, 4, 8, 2, 2, 1, (3, 3), ((0, 0), (0, 0)), (0, 0), (1, 1)),
    ("s3_pad_adj", 2, 5, 4, 4, 6, 3, 3, 1, (3, 2), ((1, 1), (0, 1)), (1, 0), (1, 1)),
    # k == s fused path (single conv + depth-to-space) with groups.
    ("k_eq_s_grouped", 2, 4, 5, 8, 12, 2, 2, 2, (2, 2), ((0, 0), (0, 0)), (0, 0), (1, 1)),
    ("k_eq_s_3x3", 1, 4, 4, 4, 8, 3, 3, 1, (3, 3), ((0, 0), (0, 0)), (0, 0), (1, 1)),
]


@pytest.mark.parametrize(
    "name,b,h,w,c,o,kh,kw,groups,strides,padding,adj,dilation", DECONV_CASES,
    ids=[c[0] for c in DECONV_CASES])
@pytest.mark.parametrize("zps", [(121, 103), (128, 128)])
def test_deconv2d_bit_exact(name, b, h, w, c, o, kh, kw, groups, strides,
                            padding, adj, dilation, zps):
    a_zp, w_zp = zps
    a, wt, bias = make_conv_case(b, h, w, c, o, kh, kw, groups)
    want_acc = ref.deconv2d_acc(a, wt, bias, a_zp, w_zp, strides, padding,
                                adj, dilation, groups)
    packed = pack_conv_weights(wt, bias, a_zp, w_zp, groups, transposed=True)
    scale, zp = scale_for(want_acc)
    rp = make_requant_params("q31", scale, zp)
    got = np.asarray(q8deconv2d(jnp.asarray(a), packed, rp, strides, padding,
                                adj, dilation))
    np.testing.assert_array_equal(got, oracles.oracle_q31(want_acc, rp))
