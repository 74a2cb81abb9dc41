"""Operator-lifecycle tests (tier 2, mirroring the reference's
test/*-operator-tester.h pattern): full create -> run lifecycle with
dynamically derived quantization scales, bit-exact against int32 reference
accumulators + the Q31 oracle; plus validation-rejection coverage."""

import numpy as np
import pytest

import jax.numpy as jnp

from qnnpack_tpu import InvalidParameterError, UnsupportedParameterError
from qnnpack_tpu import ops
from qnnpack_tpu.quant import compute_q31_params, oracles

import reference_ops as ref

RNG = np.random.default_rng(0x0905)


def rand_u8(*shape):
    return RNG.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)


def derive_scales(acc, input_scale=0.9, kernel_scale=1.1):
    """Dynamic output scale from accumulator range so requantization is
    numerically interesting (gemm-microkernel-tester.h:236-238)."""
    spread = max(int(acc.max()) - int(acc.min()), 256)
    output_scale = float(np.float32(input_scale * kernel_scale * spread / 254.0))
    conv_scale = float(np.float32(input_scale * kernel_scale / output_scale))
    return output_scale, conv_scale


class TestConvolutionOp:
    @pytest.mark.parametrize("case", [
        # (h, w, c, o, kh, kw, groups, strides, padding)
        (8, 8, 8, 16, 3, 3, 1, (1, 1), ((1, 1), (1, 1))),
        (7, 7, 16, 24, 1, 1, 1, (1, 1), ((0, 0), (0, 0))),   # gemm path
        (9, 9, 16, 16, 3, 3, 16, (2, 2), ((1, 1), (1, 1))),  # depthwise
        (6, 6, 12, 24, 3, 3, 3, (1, 1), ((1, 1), (1, 1))),   # grouped
    ])
    def test_lifecycle_bit_exact(self, case):
        h, w, c, o, kh, kw, groups, strides, padding = case
        a = rand_u8(2, h, w, c)
        wt = rand_u8(o, kh, kw, c // groups)
        bias = RNG.integers(-5000, 5000, (o,), dtype=np.int64).astype(np.int32)
        a_zp, w_zp, out_zp = 121, 103, 128
        acc = ref.conv2d_acc(a, wt, bias, a_zp, w_zp, strides, padding,
                             (1, 1), groups)
        output_scale, conv_scale = derive_scales(acc)

        op = ops.Convolution2D(
            kernel=wt, bias=bias, input_zero_point=a_zp, input_scale=0.9,
            kernel_zero_point=w_zp, kernel_scale=1.1,
            output_zero_point=out_zp, output_scale=output_scale,
            padding=padding, strides=strides, groups=groups)
        assert op.output_shape(a.shape) == acc.shape
        got = np.asarray(op(jnp.asarray(a)))
        rp = compute_q31_params(conv_scale, out_zp)
        np.testing.assert_array_equal(got, oracles.oracle_q31(acc, rp))
        op.delete()

    def test_conv_scale_above_one_rejected(self):
        with pytest.raises(UnsupportedParameterError,
                           match="convolution scale must be below 1.0"):
            ops.Convolution2D(
                kernel=rand_u8(8, 3, 3, 4), bias=None, input_zero_point=0,
                input_scale=2.0, kernel_zero_point=0, kernel_scale=2.0,
                output_zero_point=0, output_scale=1.0)

    def test_zero_kernel_rejected(self):
        with pytest.raises(InvalidParameterError, match="kernel dimensions"):
            ops.Convolution2D(
                kernel=rand_u8(8, 0, 3, 4).reshape(8, 0, 3, 4), bias=None,
                input_zero_point=0, input_scale=0.5, kernel_zero_point=0,
                kernel_scale=0.5, output_zero_point=0, output_scale=1.0)


class TestDeconvolutionOp:
    def test_lifecycle_bit_exact(self):
        a = rand_u8(1, 5, 5, 8)
        wt = rand_u8(8, 3, 3, 8)
        bias = RNG.integers(-2000, 2000, (8,), dtype=np.int64).astype(np.int32)
        strides, padding, adj = (2, 2), ((1, 1), (1, 1)), (1, 1)
        acc = ref.deconv2d_acc(a, wt, bias, 120, 110, strides, padding, adj)
        output_scale, conv_scale = derive_scales(acc)
        op = ops.Deconvolution2D(
            kernel=wt, bias=bias, input_zero_point=120, input_scale=0.9,
            kernel_zero_point=110, kernel_scale=1.1, output_zero_point=128,
            output_scale=output_scale, padding=padding, adjustment=adj,
            strides=strides)
        assert op.output_shape(a.shape) == acc.shape
        got = np.asarray(op(jnp.asarray(a)))
        rp = compute_q31_params(conv_scale, 128)
        np.testing.assert_array_equal(got, oracles.oracle_q31(acc, rp))


class TestFullyConnectedOp:
    def test_lifecycle_bit_exact(self):
        a = rand_u8(4, 100)
        wt = rand_u8(40, 100)
        bias = RNG.integers(-5000, 5000, (40,), dtype=np.int64).astype(np.int32)
        acc = (a.astype(np.int32) - 121) @ (wt.astype(np.int32) - 103).T \
            + bias[None, :]
        output_scale, fc_scale = derive_scales(acc)
        op = ops.FullyConnected(
            kernel=wt, bias=bias, input_zero_point=121, input_scale=0.9,
            kernel_zero_point=103, kernel_scale=1.1, output_zero_point=100,
            output_scale=output_scale)
        got = np.asarray(op(jnp.asarray(a)))
        rp = compute_q31_params(fc_scale, 100)
        np.testing.assert_array_equal(got, oracles.oracle_q31(acc, rp))


class TestPoolingOps:
    def test_max_pooling(self):
        a = rand_u8(2, 9, 9, 8)
        op = ops.MaxPooling2D(pool_size=(3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
        got = np.asarray(op(jnp.asarray(a)))
        want = ref.maxpool2d(a, (3, 3), (2, 2), ((1, 1), (1, 1)))
        np.testing.assert_array_equal(got, want)

    def test_average_pooling(self):
        a = rand_u8(2, 9, 9, 8)
        op = ops.AveragePooling2D(
            pool_size=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            input_zero_point=121, input_scale=0.7, output_zero_point=77,
            output_scale=0.5)
        got = np.asarray(op(jnp.asarray(a)))
        acc = ref.avgpool2d_acc(a, 121, (3, 3), (2, 2), ((1, 1), (1, 1)))
        want = oracles.oracle_avgpool(acc, op.qparams)
        np.testing.assert_array_equal(got, want)

    def test_global_average_pooling_rebinds_width(self):
        op = ops.GlobalAveragePooling(
            channels=16, input_zero_point=121, input_scale=0.7,
            output_zero_point=77, output_scale=0.5)
        for width in (7, 49):
            a = rand_u8(2, width, 16)
            got = np.asarray(op(jnp.asarray(a)))
            acc = (a.astype(np.int32) - 121).sum(axis=1)
            want = oracles.oracle_avgpool(acc, op._params_for_width(width))
            np.testing.assert_array_equal(got, want)

    def test_scale_ratio_rejected(self):
        with pytest.raises(UnsupportedParameterError, match="scale ratio"):
            ops.AveragePooling2D(pool_size=(2, 2), input_zero_point=0,
                                 input_scale=1000.0, output_zero_point=0,
                                 output_scale=0.001)


class TestElementwiseOps:
    def test_add(self):
        a, b = rand_u8(3, 100), rand_u8(3, 100)
        op = ops.Add(a_zero_point=10, a_scale=0.25, b_zero_point=200,
                     b_scale=0.75, sum_zero_point=128, sum_scale=0.5)
        got = np.asarray(op(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, oracles.oracle_add(a, b, op.qparams))

    def test_add_ratio_rejected(self):
        with pytest.raises(UnsupportedParameterError, match=r"2\*\*-14"):
            ops.Add(a_zero_point=0, a_scale=1e-6, b_zero_point=0, b_scale=1.0,
                    sum_zero_point=0, sum_scale=1.0)

    def test_clamp(self):
        op = ops.Clamp(output_min=20, output_max=200)
        x = np.arange(256, dtype=np.uint8).reshape(1, 256)
        np.testing.assert_array_equal(np.asarray(op(jnp.asarray(x))),
                                      np.clip(x, 20, 200))

    def test_sigmoid(self):
        op = ops.Sigmoid(input_zero_point=121, input_scale=0.25)
        x = rand_u8(2, 333)
        np.testing.assert_array_equal(np.asarray(op(jnp.asarray(x))),
                                      np.asarray(op.lut)[x])

    def test_sigmoid_output_scale_rejected(self):
        with pytest.raises(UnsupportedParameterError, match="1/256"):
            ops.Sigmoid(input_zero_point=0, input_scale=0.5, output_scale=0.5)

    def test_leaky_relu(self):
        op = ops.LeakyReLU(negative_slope=0.01, input_zero_point=121,
                           input_scale=0.25, output_zero_point=100,
                           output_scale=0.5)
        x = rand_u8(2, 64)
        np.testing.assert_array_equal(np.asarray(op(jnp.asarray(x))),
                                      np.asarray(op.lut)[x])

    def test_leaky_relu_slope_rejected(self):
        with pytest.raises(UnsupportedParameterError, match="slope"):
            ops.LeakyReLU(negative_slope=1.5, input_zero_point=0,
                          input_scale=0.5, output_zero_point=0,
                          output_scale=0.5)

    def test_softargmax(self):
        op = ops.SoftArgMax(channels=100, input_scale=0.1)
        x = rand_u8(4, 100)
        want = ref.softargmax(x, np.asarray(op.lut))
        np.testing.assert_array_equal(np.asarray(op(jnp.asarray(x))), want)

    def test_channel_shuffle(self):
        op = ops.ChannelShuffle(groups=4, group_channels=8)
        x = rand_u8(2, 32)
        want = x.reshape(2, 4, 8).swapaxes(1, 2).reshape(2, 32)
        np.testing.assert_array_equal(np.asarray(op(jnp.asarray(x))), want)

    def test_channel_shuffle_one_group_rejected(self):
        with pytest.raises(InvalidParameterError, match="two groups"):
            ops.ChannelShuffle(groups=1, group_channels=8)
