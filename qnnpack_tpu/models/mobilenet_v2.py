"""Quantized MobileNetV2: the reference's headline end-to-end workload.

The reference benchmarks quantized MobileNet v2 1.0_224 batch-1 through
Caffe2 (README.md:63-147) and carries its full layer table in
bench/convolution.cc:453-537.  Here the model is a single jitted program
composing the framework's functional ops - stem conv, inverted-residual
bottlenecks (1x1 expand -> depthwise 3x3 -> 1x1 linear project, residual
add), head conv, global average pooling, and fully-connected classifier -
so XLA fuses requantization into every conv and the whole forward stays
on-chip.

ReLU6 folds into the requantization clamp: output_max = zp + round(6/scale)
(the standard quantized-inference fusion; the reference realizes the same
clamp through conv output_min/output_max, include/qnnpack.h:60-61).

Weights are either caller-supplied (uint8 per-layer dicts) or synthesized
randomly for benchmarking; accuracy is pinned by bit-exactness tests against
numpy reference loop nests, not by pretrained checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..nn.conv import pack_conv_weights, q8conv2d
from ..nn.gemm import q8gemm
from ..nn.packing import pack_gemm_weights
from ..nn.pool import q8gavgpool
from ..nn.requant_dispatch import make_requant_params
from ..quant.params import compute_add_quant_params, compute_avgpool_quant_params
from ..quant.requantize import add_quantize

# Standard MobileNetV2 inverted-residual config: (expansion, channels,
# repeats, first-stride) - matches the shapes in bench/convolution.cc:453-537.
INVERTED_RESIDUAL_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]

ACT_SCALE = 0.1  # uniform synthetic activation scale
ACT_ZP = 128
KERNEL_SCALE = 0.02
KERNEL_ZP = 128


def _relu6_max(scale: float, zero_point: int) -> int:
    return min(255, zero_point + int(round(6.0 / scale)))


@dataclasses.dataclass
class _ConvLayer:
    kind: str  # "conv" | "dwconv" | "gemm"
    strides: tuple
    padding: tuple
    groups: int
    rparams: Any


@dataclasses.dataclass
class _ModelSpec:
    layers: list  # list of (name, layer-kind-specific static spec)
    num_classes: int


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def build_mobilenet_v2(rng: np.random.Generator, *, width_mult: float = 1.0,
                       num_classes: int = 1000, requant: str = "fp32",
                       input_size: int = 224, cfg=None, stem_channels=32,
                       head_channels=1280):
    """Construct (params, spec) for a synthetic-weights quantized MobileNetV2.

    params is a pytree (list) of packed-weight records; spec carries the
    static per-layer configuration including requantization constants.
    Use `mobilenet_v2_forward(params, spec, x)` (jit it) to run.
    """
    cfg = cfg if cfg is not None else INVERTED_RESIDUAL_CFG
    layers = []
    params = []
    raw_weights = []  # [(kernel_u8, bias_i32) | None], for parity testing

    def rand_kernel(o, kh, kw, i):
        return rng.integers(0, 256, (o, kh, kw, i), dtype=np.int64).astype(np.uint8)

    def rand_bias(o):
        return rng.integers(-8000, 8000, (o,), dtype=np.int64).astype(np.int32)

    def conv_scale():
        return ACT_SCALE * KERNEL_SCALE / ACT_SCALE  # < 1 by construction

    def add_conv(name, cin, cout, kh, kw, strides, padding, groups=1,
                 relu6=True):
        # Quantized ReLU6 clamp window: [zp, zp + 6/scale] - real 0 maps to
        # the zero point, matching models/graph.py's convention.
        omin = ACT_ZP if relu6 else 0
        omax = _relu6_max(ACT_SCALE, ACT_ZP) if relu6 else 255
        rp = make_requant_params(requant, conv_scale(), ACT_ZP, omin, omax)
        k = rand_kernel(cout, kh, kw, cin // groups)
        b = rand_bias(cout)
        raw_weights.append((k, b))
        if (kh, kw) == (1, 1) and strides == (1, 1) and groups == 1:
            packed = pack_gemm_weights(k.reshape(cout, cin), b, ACT_ZP,
                                       KERNEL_ZP)
            layers.append(("conv", name, _ConvLayer("gemm", strides, padding, 1, rp)))
        else:
            packed = pack_conv_weights(k, b, ACT_ZP, KERNEL_ZP, groups)
            kind = "dwconv" if groups == cin and groups == cout else "conv"
            layers.append(("conv", name, _ConvLayer(kind, strides, padding, groups, rp)))
        params.append(packed)

    stem = _make_divisible(stem_channels * width_mult)
    add_conv("stem", 3, stem, 3, 3, (2, 2), ((0, 1), (0, 1)))
    cin = stem
    spatial = input_size // 2  # stem stride 2 with (0,1) padding

    for block_idx, (t, c, n, s) in enumerate(cfg):
        cout = _make_divisible(c * width_mult)
        for i in range(n):
            stride = s if i == 0 else 1
            if stride == 2:
                spatial //= 2
            hidden = cin * t
            prefix = f"block{block_idx}_{i}"
            has_residual = stride == 1 and cin == cout
            if has_residual:
                layers.append(("save", f"{prefix}_save", None))
                params.append(None)
                raw_weights.append(None)
            if t != 1:
                add_conv(f"{prefix}_expand", cin, hidden, 1, 1, (1, 1),
                         ((0, 0), (0, 0)))
            pad = ((0, 1), (0, 1)) if stride == 2 else ((1, 1), (1, 1))
            add_conv(f"{prefix}_dw", hidden, hidden, 3, 3, (stride, stride),
                     pad, groups=hidden)
            add_conv(f"{prefix}_project", hidden, cout, 1, 1, (1, 1),
                     ((0, 0), (0, 0)), relu6=False)
            if has_residual:
                layers.append(("add", f"{prefix}_add", compute_add_quant_params(
                    ACT_ZP, ACT_ZP, ACT_ZP, 1.0, 1.0)))
                params.append(None)
                raw_weights.append(None)
            cin = cout

    head = _make_divisible(head_channels * max(1.0, width_mult))
    add_conv("head", cin, head, 1, 1, (1, 1), ((0, 0), (0, 0)))

    layers.append(("gap", "gap", compute_avgpool_quant_params(
        -ACT_ZP * spatial * spatial, 1.0 / (spatial * spatial), ACT_ZP,
        input_zero_point=ACT_ZP)))
    params.append(None)
    raw_weights.append(None)

    fc_rp = make_requant_params(requant, conv_scale(), ACT_ZP)
    layers.append(("conv", "fc", _ConvLayer("gemm", (1, 1), ((0, 0), (0, 0)), 1, fc_rp)))
    fc_kernel = rng.integers(0, 256, (num_classes, head),
                             dtype=np.int64).astype(np.uint8)
    fc_bias = rand_bias(num_classes)
    raw_weights.append((fc_kernel, fc_bias))
    params.append(pack_gemm_weights(fc_kernel, fc_bias, ACT_ZP, KERNEL_ZP))

    spec = _ModelSpec(layers=layers, num_classes=num_classes)
    spec.raw_weights = raw_weights
    return params, spec


def mobilenet_v2_forward(params, spec: _ModelSpec, x_u8):
    """Forward pass: uint8 NHWC [B, S, S, 3] -> uint8 logits [B, classes].

    Pure function of (params pytree, static spec); jit via closure or
    functools.partial with spec static."""
    x = x_u8
    residual = None
    for (tag, name, layer), p in zip(spec.layers, params):
        if tag == "save":
            residual = x
        elif tag == "add":
            x = add_quantize(x, residual, layer)
            residual = None
        elif tag == "gap":
            b, h, w, c = x.shape
            x = q8gavgpool(x.reshape(b, h * w, c), layer, axis=1)
        elif tag == "conv" and layer.kind == "gemm":
            # Natural-rank contraction; the 2D collapse costs a relayout
            # copy (see nn/gemm.q8gemm_acc).
            x = q8gemm(x, p, layer.rparams)
        elif tag == "conv":
            x = q8conv2d(x, p, layer.rparams, layer.strides, layer.padding)
        else:
            raise ValueError(f"unknown layer tag {tag!r}")
    return x
