"""Biased-int8 representation: the TPU-native encoding of asymmetric uint8.

The reference keeps tensors as raw uint8 and subtracts zero points inside
each NEON microkernel (e.g. vsubl against the kernel zero point,
src/q8gemm/4x8-neon.c).  The TPU MXU consumes *signed* int8 natively, so we
instead re-bias every uint8 tensor by XOR 0x80 (value - 128) once at the
boundary and carry the shifted zero points through the exact same algebra:

    (a - za)(w - zw) == (a' - za')(w' - zw')
    where x' = x - 128 (int8) and z' = z - 128.

Integer arithmetic is exact, so accumulator values - and therefore requantized
outputs - are bit-identical to the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def u8_to_biased_i8(x):
    """uint8 -> int8 with value shifted by -128 (a single XOR on device)."""
    x = jnp.asarray(x, jnp.uint8)
    return lax.bitcast_convert_type(x ^ jnp.uint8(0x80), jnp.int8)


def biased_i8_to_u8(x):
    """int8 (biased) -> uint8 with value shifted by +128."""
    x = jnp.asarray(x, jnp.int8)
    return lax.bitcast_convert_type(x, jnp.uint8) ^ jnp.uint8(0x80)


def biased_zero_point(zero_point: int) -> int:
    """Shift a uint8 zero point into the biased-int8 domain."""
    return int(zero_point) - 128
