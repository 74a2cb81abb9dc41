"""Pooling + elementwise operator tests: max/avg/global-avg pool, add, clamp,
sigmoid/leaky-relu LUTs, softargmax, channel shuffle - mirroring the
reference's per-operator gtest coverage (test/max-pooling.cc,
average-pooling.cc, global-average-pooling.cc, add.cc, clamp.cc, sigmoid.cc,
leaky-relu.cc, softargmax.cc, channel-shuffle.cc)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qnnpack_tpu.nn import (q8avgpool2d, q8gavgpool, u8maxpool2d, u8softargmax,
                            x8lut, x8zip, build_sigmoid_lut,
                            build_leaky_relu_lut, build_softargmax_lut)
from qnnpack_tpu.quant import (compute_avgpool_quant_params,
                               compute_u8_clamping_params, oracles)
from qnnpack_tpu.quant.requantize import clamp_u8

import reference_ops as ref

RNG = np.random.default_rng(0x900D)


def rand_u8(*shape):
    return RNG.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)


class TestMaxPool:
    @pytest.mark.parametrize("case", [
        # (h, w, c, pool, strides, padding, dilation)
        (8, 8, 8, (2, 2), (2, 2), ((0, 0), (0, 0)), (1, 1)),
        (9, 9, 16, (3, 3), (2, 2), ((1, 1), (1, 1)), (1, 1)),
        (7, 7, 3, (3, 3), (1, 1), ((1, 1), (1, 1)), (1, 1)),
        (12, 12, 8, (3, 3), (2, 2), ((0, 1), (1, 0)), (1, 1)),
        (14, 14, 4, (3, 3), (2, 2), ((2, 2), (2, 2)), (2, 2)),
        (5, 5, 2, (5, 5), (1, 1), ((0, 0), (0, 0)), (1, 1)),
    ])
    def test_vs_reference(self, case):
        h, w, c, pool, strides, padding, dilation = case
        a = rand_u8(2, h, w, c)
        want = ref.maxpool2d(a, pool, strides, padding, dilation)
        got = np.asarray(u8maxpool2d(jnp.asarray(a), pool, strides, padding,
                                     dilation))
        np.testing.assert_array_equal(got, want)


class TestAvgPool:
    @pytest.mark.parametrize("case", [
        (8, 8, 8, (2, 2), (2, 2), ((0, 0), (0, 0))),
        (9, 9, 16, (3, 3), (2, 2), ((1, 1), (1, 1))),
        (11, 11, 4, (5, 5), (3, 3), ((2, 2), (2, 2))),
        (7, 9, 2, (7, 7), (1, 1), ((3, 3), (3, 3))),
    ])
    @pytest.mark.parametrize("izp,ozp", [(121, 77), (0, 0), (255, 255)])
    def test_vs_reference(self, case, izp, ozp):
        h, w, c, pool, strides, padding = case
        a = rand_u8(2, h, w, c)
        ps = pool[0] * pool[1]
        in_scale, out_scale = 0.7, 0.5
        params = compute_avgpool_quant_params(
            -izp * ps, in_scale / (out_scale * ps), ozp,
            input_zero_point=izp)
        want_acc = ref.avgpool2d_acc(a, izp, pool, strides, padding)
        want = oracles.oracle_avgpool(want_acc, params)
        got = np.asarray(q8avgpool2d(jnp.asarray(a), params, pool, strides,
                                     padding))
        np.testing.assert_array_equal(got, want)


class TestGlobalAvgPool:
    @pytest.mark.parametrize("width,channels", [(1, 8), (7, 16), (100, 3), (49, 1280)])
    @pytest.mark.parametrize("izp", [0, 128, 255])
    def test_nwc(self, width, channels, izp):
        a = rand_u8(3, width, channels)
        params = compute_avgpool_quant_params(
            -izp * width, 0.7 / (0.5 * width), 128)
        acc = (a.astype(np.int32) - izp).sum(axis=1)
        want = oracles.oracle_avgpool(acc, params)
        got = np.asarray(q8gavgpool(jnp.asarray(a), params, axis=1))
        np.testing.assert_array_equal(got, want)


class TestClamp:
    def test_all_values(self):
        p = compute_u8_clamping_params(17, 231)
        x = np.arange(256, dtype=np.uint8)
        got = np.asarray(clamp_u8(jnp.asarray(x), p))
        np.testing.assert_array_equal(got, np.clip(x, 17, 231))


class TestLutOps:
    def test_sigmoid_lut_and_apply(self):
        lut = build_sigmoid_lut(input_zero_point=121, input_scale=0.25)
        # Spot-check the construction against direct float math.
        x0 = 0.25 * (np.arange(256) - 121)
        expect = np.rint(np.clip(256.0 / (1.0 + np.exp(-x0)), 0, 255))
        np.testing.assert_array_equal(lut, expect.astype(np.uint8))
        x = rand_u8(4, 333)
        got = np.asarray(x8lut(jnp.asarray(x), lut))
        np.testing.assert_array_equal(got, lut[x])

    def test_leaky_relu_lut(self):
        lut = build_leaky_relu_lut(input_zero_point=100,
                                  input_output_scale=1.5,
                                  negative_slope=0.01, output_zero_point=80)
        # All arithmetic in float32, matching the C `float` math exactly
        # (e.g. -150.0f * 0.01f rounds to exactly -1.5f).
        x0 = (np.float32(1.5) * (np.arange(256) - 100).astype(np.float32))
        y = np.where(x0 < 0, x0 * np.float32(0.01), x0).astype(np.float32)
        y = np.clip(y, np.float32(0 - 80), np.float32(255 - 80))
        expect = (np.rint(y).astype(np.int64) + 80).astype(np.uint8)
        np.testing.assert_array_equal(lut, expect)

    def test_softargmax(self):
        for channels in (2, 17, 100, 1000):
            lut = build_softargmax_lut(input_scale=0.1, channels=channels)
            x = rand_u8(5, channels)
            want = ref.softargmax(x, lut)
            got = np.asarray(u8softargmax(jnp.asarray(x), lut))
            np.testing.assert_array_equal(got, want)

    def test_softargmax_uniform_row(self):
        channels = 32
        lut = build_softargmax_lut(input_scale=0.5, channels=channels)
        x = np.full((1, channels), 200, np.uint8)
        got = np.asarray(u8softargmax(jnp.asarray(x), lut))
        # Uniform input -> uniform probabilities 256/channels = 8.
        np.testing.assert_array_equal(got, np.full((1, channels), 8, np.uint8))


class TestChannelShuffle:
    @pytest.mark.parametrize("groups,k", [(2, 8), (3, 5), (4, 16), (7, 3)])
    def test_interleave(self, groups, k):
        c = groups * k
        x = rand_u8(3, c)
        got = np.asarray(x8zip(jnp.asarray(x), groups))
        want = x.reshape(3, groups, k).swapaxes(1, 2).reshape(3, c)
        np.testing.assert_array_equal(got, want)

    def test_roundtrip(self):
        x = rand_u8(2, 12)
        once = np.asarray(x8zip(jnp.asarray(x), 3))
        back = np.asarray(x8zip(jnp.asarray(once), 4))
        np.testing.assert_array_equal(back, x)


class TestSoftargmaxFactored:
    """The 16x16 factored exp-LUT lookup must be bit-identical to the
    plain 256-entry path (nn/elementwise.py build_softargmax_lut_factored:
    f32 multiply + rint are IEEE-deterministic across numpy and the VPU,
    and the sparse correction list absorbs every rounding disagreement)."""

    @pytest.mark.parametrize("scale,channels", [
        (0.05, 128), (0.1, 1000), (0.5, 32), (0.01, 64), (0.2, 256),
    ])
    def test_matches_plain_path(self, scale, channels):
        from qnnpack_tpu.nn.elementwise import build_softargmax_lut_factored
        lut, f16, g16, corr = build_softargmax_lut_factored(scale, channels)
        if f16 is None:
            pytest.skip("factorization declined for this scale")
        fac = (jnp.asarray(f16), jnp.asarray(g16), corr)
        x = rand_u8(7, channels)
        want = np.asarray(u8softargmax(jnp.asarray(x), lut))
        got = np.asarray(u8softargmax(jnp.asarray(x), lut, factored=fac))
        np.testing.assert_array_equal(got, want)

    def test_all_256_indices_exact(self):
        # Every possible table index must reconstruct exactly: a row
        # containing 255 forces offsets spanning the full table.
        from qnnpack_tpu.nn.elementwise import (_lut256, _lut_factored,
                                                build_softargmax_lut_factored)
        lut, f16, g16, corr = build_softargmax_lut_factored(0.05, 128)
        assert f16 is not None
        idx = jnp.arange(256, dtype=jnp.int32)
        want = np.asarray(_lut256(jnp.asarray(lut, jnp.uint32),
                                  idx.astype(jnp.uint8)))
        got = np.asarray(_lut_factored(idx, jnp.asarray(f16),
                                       jnp.asarray(g16), corr))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got, np.asarray(lut, np.uint32))

    def test_bert_spec_carries_factorization(self):
        from qnnpack_tpu.models.bert import BertConfig, build_bert_encoder
        rng = np.random.default_rng(0)
        _, spec = build_bert_encoder(rng, BertConfig(layers=1, seq_len=128))
        assert spec["softargmax_fac"] is not None

    def test_t16_bilinear_all_256_indices_exact(self):
        """The production lookup (round 5): onehot(hi) @ T16 . onehot(lo)
        must reconstruct every table entry exactly, for tables where the
        factored form declined as well (no preconditions)."""
        from qnnpack_tpu.nn.elementwise import _lut_t16, build_softargmax_lut
        for scale, channels in [(0.05, 128), (0.1, 1000), (0.5, 32),
                                (0.01, 64), (1.0, 1)]:
            lut = build_softargmax_lut(scale, channels)
            idx = jnp.arange(256, dtype=jnp.int32)
            got = np.asarray(_lut_t16(
                idx, jnp.asarray(lut, jnp.uint32).astype(jnp.float32)
                .reshape(16, 16)))
            np.testing.assert_array_equal(got, np.asarray(lut, np.uint32))

    def test_default_softargmax_path_matches_plain_lut(self):
        from qnnpack_tpu.nn.elementwise import _lut256
        lut = jnp.asarray(
            __import__("qnnpack_tpu.nn.elementwise", fromlist=["x"])
            .build_softargmax_lut(0.05, 200), jnp.uint32)
        x = rand_u8(7, 200)
        idx = jnp.asarray(x, jnp.uint8).astype(jnp.int32)
        m = jnp.max(idx, axis=-1, keepdims=True)
        off = (idx + (255 - m)).astype(jnp.uint8)
        e_plain = np.asarray(_lut256(lut, off))
        got = np.asarray(u8softargmax(jnp.asarray(x), lut))
        # reconstruct the reference normalize from the plain-path e
        s = e_plain.astype(np.uint64).sum(-1, keepdims=True)
        want = np.minimum((e_plain.astype(np.uint64) * 256 + s // 2) // s,
                          255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)
