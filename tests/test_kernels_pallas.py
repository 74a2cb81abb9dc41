"""Pallas kernel-layer tests.

Mirror of the reference's microkernel test tier (SURVEY.md section 4 tier 1):
each Pallas kernel is asserted bit-exact against the tested XLA functional
path (which in turn is bit-exact vs. the scalar oracles), across shape
sweeps covering sub-tile edges, strides, dilation, padding, and channel
counts that don't divide the lane width.

Two execution tiers, the analogue of the reference's per-ISA gates
(src/qnnpack/isa-checks.h:8-32 + scripts/test-android-*.sh on-device runs):
  - CPU CI (default): kernels run in interpret mode.
  - On-hardware:  QNNPACK_TPU_TEST_PLATFORM=tpu python -m pytest \
        tests/test_kernels_pallas.py tests/test_q8gemm.py -q
    compiles every kernel with Mosaic and runs it on the real chip
    (interpret=False), asserting the same bit-exact contracts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Compiled on real hardware; interpreted on the CPU CI platform.
INTERPRET = jax.default_backend() != "tpu"

from qnnpack_tpu.kernels import (q8avgpool_pallas, q8conv_pallas,
                                 q8dwconv_pallas, q8gavgpool_pallas,
                                 q8vadd_pallas, u8clamp_pallas,
                                 u8maxpool_pallas, u8rmax_pallas)
from qnnpack_tpu.nn import pool as nnpool
from qnnpack_tpu.nn.conv import pack_conv_weights, q8conv2d
from qnnpack_tpu.nn.requant_dispatch import make_requant_params
from qnnpack_tpu.quant.params import (ClampParams, compute_add_quant_params,
                                      compute_avgpool_quant_params)
from qnnpack_tpu.quant.requantize import add_quantize, clamp_u8

RNG = np.random.default_rng(0xC0DE)

DW_CASES = [
    # h, w, c, kh, kw, stride, dilation, pad
    (13, 11, 24, 3, 3, 1, 1, 1),
    (14, 14, 32, 3, 3, 2, 1, 1),
    (9, 9, 8, 5, 5, 1, 1, 2),
    (12, 10, 16, 3, 3, 2, 2, 2),
    (7, 7, 160, 3, 3, 1, 1, 1),     # channels > one lane tile
    (5, 5, 3, 1, 1, 1, 1, 0),       # degenerate 1x1 window
]


@pytest.mark.parametrize("scheme", ["q31", "fp32"])
@pytest.mark.parametrize("case", DW_CASES, ids=[str(c) for c in DW_CASES])
def test_q8dwconv_bit_exact(case, scheme):
    h, w, c, kh, kw, s, d, pad = case
    a = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    k = RNG.integers(0, 256, (c, kh, kw, 1), dtype=np.uint8)
    bias = RNG.integers(-1000, 1000, (c,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, 103, groups=c)
    rp = make_requant_params(scheme, 0.0037, 117)
    kw_args = dict(strides=(s, s), padding=((pad, pad), (pad, pad)),
                   dilation=(d, d))
    want = q8conv2d(jnp.asarray(a), packed, rp, **kw_args)
    got = q8dwconv_pallas(jnp.asarray(a), packed, rp, **kw_args,
                          tile_h=5, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


CONV_CASES = [
    # h, w, c, o, kh, kw, stride, dilation, pad
    (9, 9, 16, 24, 3, 3, 1, 1, 1),
    (14, 14, 8, 32, 3, 3, 2, 1, 1),
    (8, 8, 32, 16, 1, 1, 1, 1, 0),       # 1x1 = the reference "gemm" type
    (8, 8, 140, 16, 1, 1, 1, 1, 0),      # channels > one lane tile
    (11, 9, 24, 40, 5, 3, 2, 2, 2),      # asymmetric kernel + dilation
    (6, 6, 8, 136, 3, 3, 1, 1, 1),       # output channels > tile_o
]


@pytest.mark.parametrize("case", CONV_CASES, ids=[str(c) for c in CONV_CASES])
def test_q8conv_bit_exact(case):
    h, w, c, o, kh, kw, s, d, pad = case
    a = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    k = RNG.integers(0, 256, (o, kh, kw, c), dtype=np.uint8)
    bias = RNG.integers(-1000, 1000, (o,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, 103)
    rp = make_requant_params("q31", 0.0037, 117)
    kw_args = dict(strides=(s, s), padding=((pad, pad), (pad, pad)),
                   dilation=(d, d))
    want = q8conv2d(jnp.asarray(a), packed, rp, **kw_args)
    got = q8conv_pallas(jnp.asarray(a), packed, rp, **kw_args,
                        tile_h=3, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8conv_zero_kernel_zero_point():
    """kzp == 128 biases to 0 and skips the row-sum path in-kernel."""
    a = RNG.integers(0, 256, (1, 7, 7, 16), dtype=np.uint8)
    k = RNG.integers(0, 256, (8, 3, 3, 16), dtype=np.uint8)
    packed = pack_conv_weights(k, None, 121, 128)
    rp = make_requant_params("q31", 0.0037, 117)
    want = q8conv2d(jnp.asarray(a), packed, rp, padding=((1, 1), (1, 1)))
    got = q8conv_pallas(jnp.asarray(a), packed, rp,
                        padding=((1, 1), (1, 1)), interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


POOL_CASES = [
    # h, w, c, k, stride, pad
    (13, 13, 17, 3, 2, 1),
    (9, 9, 140, 2, 2, 0),
    (12, 12, 8, 4, 3, 1),
]


@pytest.mark.parametrize("case", POOL_CASES, ids=[str(c) for c in POOL_CASES])
def test_u8maxpool_bit_exact(case):
    h, w, c, k, s, pad = case
    x = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    want = jnp.clip(
        nnpool.u8maxpool2d(jnp.asarray(x), (k, k), (s, s),
                           ((pad, pad), (pad, pad))), 5, 250)
    got = u8maxpool_pallas(jnp.asarray(x), (k, k), (s, s),
                           ((pad, pad), (pad, pad)), output_min=5,
                           output_max=250, tile_h=3, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("case", POOL_CASES, ids=[str(c) for c in POOL_CASES])
def test_q8avgpool_bit_exact(case):
    h, w, c, k, s, pad = case
    x = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    params = compute_avgpool_quant_params(-121 * k * k, 0.25, 117,
                                          input_zero_point=121)
    want = nnpool.q8avgpool2d(jnp.asarray(x), params, (k, k), (s, s),
                              ((pad, pad), (pad, pad)))
    got = q8avgpool_pallas(jnp.asarray(x), params, (k, k), (s, s),
                           ((pad, pad), (pad, pad)), tile_h=3, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("s,c", [(49, 137), (7, 8), (100, 256)])
def test_q8gavgpool_bit_exact(s, c):
    x = RNG.integers(0, 256, (3, s, c), dtype=np.uint8)
    params = compute_avgpool_quant_params(-121 * s, 0.25, 117)
    want = nnpool.q8gavgpool(jnp.asarray(x), params, axis=1)
    got = q8gavgpool_pallas(jnp.asarray(x), params, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8vadd_bit_exact():
    a = RNG.integers(0, 256, (3, 7, 501), dtype=np.uint8)
    b = RNG.integers(0, 256, (3, 7, 501), dtype=np.uint8)
    params = compute_add_quant_params(121, 99, 117, 0.5, 0.75)
    want = add_quantize(jnp.asarray(a), jnp.asarray(b), params)
    got = q8vadd_pallas(jnp.asarray(a), jnp.asarray(b), params,
                        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_u8clamp_bit_exact():
    x = RNG.integers(0, 256, (5, 333), dtype=np.uint8)
    params = ClampParams(output_min=13, output_max=200)
    want = clamp_u8(jnp.asarray(x), params)
    got = u8clamp_pallas(jnp.asarray(x), params, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_u8rmax_bit_exact():
    x = RNG.integers(0, 256, (9, 301), dtype=np.uint8)
    got = u8rmax_pallas(jnp.asarray(x), interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), x.max(axis=1))


STEM_CASES = [
    # h, w, c, o, k, pad  (stride fixed at 2: the kernel's contract)
    (23, 22, 3, 8, 7, ((2, 3), (2, 3))),   # 7x7 resnet/squeezenet shape
    (17, 18, 3, 24, 3, ((0, 1), (0, 1))),  # 3x3 mobilenet/shufflenet shape
    (16, 16, 4, 16, 2, ((0, 0), (0, 0))),  # even kernel, C_in = 4
    (15, 15, 1, 8, 3, ((1, 1), (1, 1))),   # single input channel
    (33, 9, 3, 130, 5, ((2, 2), (2, 2))),  # O > one lane tile, tall input
]


@pytest.mark.parametrize("scheme", ["q31", "fp32"])
@pytest.mark.parametrize("case", STEM_CASES, ids=[str(c) for c in STEM_CASES])
def test_q8stem_bit_exact(case, scheme):
    """Stem kernel vs the XLA conv path (itself bit-exact vs the loop-nest
    reference): stride-2, kzp == 128 (biased 0), per-tensor requant."""
    from qnnpack_tpu.kernels.q8stem import q8stem_pallas
    h, w, c, o, k, pad = case
    a = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    kern = RNG.integers(0, 256, (o, k, k, c), dtype=np.uint8)
    bias = RNG.integers(-1000, 1000, (o,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(kern, bias, 121, 128)
    rp = make_requant_params(scheme, 0.0037, 117)
    want = q8conv2d(jnp.asarray(a), packed, rp, (2, 2), pad)
    got = q8stem_pallas(jnp.asarray(a), packed, rp, padding=pad,
                        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8stem_per_channel_bit_exact():
    """Per-channel requant flows through the stem kernel's scale input."""
    from qnnpack_tpu.kernels.q8stem import q8stem_pallas
    from qnnpack_tpu.quant.params import compute_per_channel_fp32_params
    h, w, c, o, k, pad = 19, 21, 3, 32, 7, ((2, 3), (2, 3))
    a = RNG.integers(0, 256, (1, h, w, c), dtype=np.uint8)
    kern = RNG.integers(0, 256, (o, k, k, c), dtype=np.uint8)
    bias = RNG.integers(-1000, 1000, (o,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(kern, bias, 121, 128)
    scales = (0.001 + 0.004 * RNG.random(o)).astype(np.float32)
    rp = compute_per_channel_fp32_params(scales, 117)
    want = q8conv2d(jnp.asarray(a), packed, rp, (2, 2), pad)
    got = q8stem_pallas(jnp.asarray(a), packed, rp, padding=pad,
                        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8stem_batch_tiling():
    """Row-tile boundaries: ho not a multiple of tile_h, several tiles."""
    from qnnpack_tpu.kernels.q8stem import q8stem_pallas
    a = RNG.integers(0, 256, (3, 45, 31, 3), dtype=np.uint8)
    kern = RNG.integers(0, 256, (16, 3, 3, 3), dtype=np.uint8)
    packed = pack_conv_weights(kern, None, 121, 128)
    rp = make_requant_params("fp32", 0.004, 121)
    pad = ((1, 1), (1, 1))
    want = q8conv2d(jnp.asarray(a), packed, rp, (2, 2), pad)
    got = q8stem_pallas(jnp.asarray(a), packed, rp, padding=pad, tile_h=8,
                        interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_q8dwconv_per_channel_bit_exact():
    """Per-channel requant flows through the dwconv kernel's BlockSpec'd
    scale input (VERDICT r4 missing #4): strided window shape, channels
    crossing a tile boundary, vs the XLA path."""
    from qnnpack_tpu.quant.params import compute_per_channel_fp32_params
    h, w, c = 14, 15, 160  # c > one 128-lane tile -> two channel tiles
    a = RNG.integers(0, 256, (2, h, w, c), dtype=np.uint8)
    k = RNG.integers(0, 256, (c, 3, 3, 1), dtype=np.uint8)
    bias = RNG.integers(-1000, 1000, (c,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, 103, groups=c)
    scales = (0.001 + 0.004 * np.random.default_rng(5).random(c)
              ).astype(np.float32)
    rp = compute_per_channel_fp32_params(scales, 117)
    want = q8conv2d(jnp.asarray(a), packed, rp, (2, 2), ((1, 1), (1, 1)))
    got = q8dwconv_pallas(jnp.asarray(a), packed, rp, strides=(2, 2),
                          padding=((1, 1), (1, 1)), interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dwconv_route_accepts_per_channel(monkeypatch):
    """The routing exclusion for per-channel models is gone: on a TPU
    backend the strided-window rule must now admit PerChannelFP32Params."""
    from qnnpack_tpu.nn.conv import _route_to_pallas_dwconv
    from qnnpack_tpu.quant.params import compute_per_channel_fp32_params
    k = RNG.integers(0, 256, (32, 3, 3, 1), dtype=np.uint8)
    packed = pack_conv_weights(k, None, 121, 103, groups=32)
    rp = compute_per_channel_fp32_params(
        np.full(32, 0.01, np.float32), 117)
    import qnnpack_tpu.nn.conv as convmod
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from qnnpack_tpu import config as config_mod
    # The gate ships False (BENCH_DWCONV_WINDOW.json retirement); force it
    # on to verify the rule itself admits per-channel params.
    tp = config_mod.TuneParams("v5e", dwconv_pallas_strided=True)
    monkeypatch.setattr(config_mod, "tune_params", lambda: tp)
    monkeypatch.setattr(convmod, "tune_params", lambda: tp, raising=False)
    assert _route_to_pallas_dwconv(packed, (2, 2), 1, 112 * 112, rp)
    tp_off = config_mod.TuneParams("v5e")
    monkeypatch.setattr(config_mod, "tune_params", lambda: tp_off)
    assert not _route_to_pallas_dwconv(packed, (2, 2), 1, 112 * 112, rp)
