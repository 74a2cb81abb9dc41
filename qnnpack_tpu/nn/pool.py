"""Quantized pooling: max, average, global average.

TPU-native replacements for the reference's u8maxpool / q8avgpool /
q8gavgpool microkernels.  The reference's uni-pass/multi-pass split and
indirection rows exist to bound NEON accumulator width and avoid copies
(SURVEY.md 2.1C); on TPU a single `lax.reduce_window` reduction with an int32
accumulator covers every window size, and the multipass zero-row padding
algebra collapses to `bias = -izp * pooling_size` (the net accumulator both
formulations produce - see average-pooling.c:166-178).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..quant.params import AvgPoolQuantParams
from ..quant.requantize import avgpool_quantize


def u8maxpool2d(x_u8, pool_size, strides=None, padding=((0, 0), (0, 0)),
                dilation=(1, 1)):
    """uint8 max pooling, NHWC.

    The reference clamps window taps to the image edge (no zero rows,
    indirection.c:192-231); padding with 0 (the uint8 minimum) is
    max-neutral whenever a window contains at least one real pixel, which
    the output-size formula guarantees."""
    ph, pw = pool_size
    sy, sx = strides if strides is not None else (ph, pw)
    x = jnp.asarray(x_u8, jnp.uint8)
    return lax.reduce_window(
        x, jnp.uint8(0), lax.max,
        window_dimensions=(1, ph, pw, 1),
        window_strides=(1, sy, sx, 1),
        window_dilation=(1, dilation[0], dilation[1], 1),
        padding=((0, 0), padding[0], padding[1], (0, 0)))


def q8avgpool2d(x_u8, params: AvgPoolQuantParams, pool_size, strides=None,
                padding=((0, 0), (0, 0))):
    """Quantized average pooling, NHWC -> uint8.

    params.bias must be -input_zero_point * pool_h * pool_w so that padded
    taps (which contribute izp via the zero buffer in the reference) cancel
    exactly; the accumulator then equals sum (x - izp) over real pixels."""
    ph, pw = pool_size
    sy, sx = strides if strides is not None else (ph, pw)
    izp = params.input_zero_point
    x = jnp.asarray(x_u8).astype(jnp.int32)
    (pt, pb), (pl_, pr) = padding
    if pt or pb or pl_ or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=izp)
    acc = lax.reduce_window(
        x, jnp.int32(0), lax.add,
        window_dimensions=(1, ph, pw, 1),
        window_strides=(1, sy, sx, 1),
        padding="VALID")
    return avgpool_quantize(acc + jnp.int32(params.bias), params)


def q8gavgpool(x_u8, params: AvgPoolQuantParams, axis=1):
    """Quantized global average pooling over `axis` (NWC width by default,
    matching qnnp_create_global_average_pooling_nwc_q8, qnnpack.h:142-160).

    params.bias must be -input_zero_point * reduced_size (set at setup,
    global-average-pooling.c:138-141)."""
    x = jnp.asarray(x_u8).astype(jnp.int32)
    acc = jnp.sum(x, axis=axis) + jnp.int32(params.bias)
    return avgpool_quantize(acc, params)
