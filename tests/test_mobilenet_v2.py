"""MobileNetV2 end-to-end tests: a reduced config is checked layer-by-layer
bit-exact against numpy reference loop nests (the model-level analogue of the
reference's operator-tester contract), and the full 224 config is
shape/smoke-checked."""

import numpy as np

import jax
import jax.numpy as jnp

from qnnpack_tpu.models.mobilenet_v2 import (ACT_ZP, KERNEL_ZP,
                                             build_mobilenet_v2,
                                             mobilenet_v2_forward)
from qnnpack_tpu.quant import oracles

import reference_ops as ref


def numpy_forward(spec, x):
    """Independent numpy execution of the model spec."""
    residual = None
    for (tag, name, layer), raw in zip(spec.layers, spec.raw_weights):
        if tag == "save":
            residual = x
        elif tag == "add":
            x = oracles.oracle_add(x, residual, layer)
        elif tag == "gap":
            b, h, w, c = x.shape
            acc = (x.reshape(b, h * w, c).astype(np.int32) - ACT_ZP).sum(axis=1)
            x = oracles.oracle_avgpool(acc, layer)
        elif tag == "conv":
            kernel, bias = raw
            if layer.kind == "gemm":
                if x.ndim == 4:
                    b, h, w, c = x.shape
                    acc = (x.reshape(-1, c).astype(np.int32) - ACT_ZP) @ \
                        (kernel.reshape(kernel.shape[0], -1).astype(np.int32)
                         - KERNEL_ZP).T + bias[None, :]
                    acc = acc.reshape(b, h, w, -1)
                else:
                    acc = (x.astype(np.int32) - ACT_ZP) @ \
                        (kernel.astype(np.int32) - KERNEL_ZP).T + bias[None, :]
            else:
                acc = ref.conv2d_acc(x, kernel, bias, ACT_ZP, KERNEL_ZP,
                                     layer.strides, layer.padding, (1, 1),
                                     layer.groups)
            x = oracles.oracle_q31(acc, layer.rparams)
        else:
            raise ValueError(tag)
    return x


def test_tiny_config_bit_exact():
    rng = np.random.default_rng(11)
    params, spec = build_mobilenet_v2(
        rng, input_size=32, num_classes=10, requant="q31",
        cfg=[(1, 8, 1, 1), (6, 16, 2, 2), (6, 24, 1, 1)],
        stem_channels=8, head_channels=32)
    x = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.int64).astype(np.uint8)
    want = numpy_forward(spec, x)
    got = np.asarray(jax.jit(
        lambda p, v: mobilenet_v2_forward(p, spec, v))(params, jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_full_config_shapes():
    rng = np.random.default_rng(12)
    params, spec = build_mobilenet_v2(rng, input_size=224)
    x = jnp.asarray(rng.integers(0, 256, (1, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))
    y = jax.jit(lambda p, v: mobilenet_v2_forward(p, spec, v))(params, x)
    assert y.shape == (1, 1000) and y.dtype == jnp.uint8
    # 53 conv layers (stem + 17 blocks x 3 - t=1 block has 2 + head + fc)
    conv_layers = [l for l in spec.layers if l[0] == "conv"]
    assert len(conv_layers) == 53
