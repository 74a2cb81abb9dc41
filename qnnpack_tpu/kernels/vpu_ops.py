"""Pallas TPU elementwise/reduction kernels (VPU path).

TPU-native replacements for the reference's flat byte-stream microkernels:
q8vadd (src/q8vadd/neon.c, dual-multiplier add, params.h:448-453), u8clamp
(src/u8clamp/), and u8rmax (src/u8rmax/, the softargmax max-reduce pass).

The reference tiles these 1-D over pthreadpool with a 4096-byte block
(operator-run.c:947-978, 1054-1089); here the same role is played by a
2-D Pallas grid over [row-tile, lane-tile] blocks.  XLA already fuses
elementwise chains well - these kernels exist for the cases where the op IS
the whole dispatch (the reference's standalone add/clamp operators) so the
quantization epilogue and the load/store run in one VMEM pass.

The x8lut / u8lut32norm families have no Pallas variant for a structural
reason: LUT application is a lowering choice, not a kernel, and the
measured-best lowering is plain XLA dots that fuse with their neighbors.
`jnp.take`'s gather lowers to a serialized dynamic-slice loop on this
backend (1618 us for a [1,12,128,128] lookup, v5e 2026-08-21) while the
identical math as onehot(x) @ table runs in 104 us - a 15.6x win - and the
softargmax exp table further factors into two 16-entry exact lookups
(nn/elementwise.py _lut256 / build_softargmax_lut_factored, both committed
in BENCH_MODELS.json's bert note).  Wrapping those dots in a pallas_call
would only detach them from the surrounding XLA fusion; the reference
makes the mirrored hardware-driven call (a LUT beats vector exp on NEON,
sigmoid.c:90-110).

STATUS (measured 2026-08-21, BENCH_KERNEL_ROUTING.json): bench-only, not
dispatched.  XLA's fused elementwise lowering wins every measured shape by
2-6x: vadd 128x14x14x96: XLA 461 vs Pallas 94 GB/s; clamp 128x28x28x96:
817 vs 142; at the dispatch-bound small shapes (vadd 1x56x56x24: 57 vs 23)
both are far from HBM rate and XLA still leads.  These kernels remain the
bit-exactness cross-checks (tests/test_kernels_pallas.py).  Routing
discipline per src/init.c:69-84: no dispatch without a measured win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.dtypes import u8_to_biased_i8
from ..nn.packing import pad_to_multiple
from ..quant.params import AddQuantParams, ClampParams
from ..quant.requantize import add_quantize


def _flatten_2d(x, tile_m: int, tile_n: int):
    """Flatten to [M, tile_n] padded; returns (x2d, original_size)."""
    size = x.size
    n = tile_n
    m = -(-size // n)
    x2 = jnp.ravel(x)
    x2 = jnp.pad(x2, (0, m * n - size))
    x2 = x2.reshape(m, n)
    x2 = pad_to_multiple(x2, 0, tile_m)
    return x2, size


def _elementwise_pallas(kernel_body, out_dtype, tile_m, tile_n, interpret,
                        *arrays):
    """Run an elementwise kernel over flattened [tile_m, tile_n] blocks."""
    shape = arrays[0].shape
    flats = []
    size = arrays[0].size
    for a in arrays:
        a2, size = _flatten_2d(a, tile_m, tile_n)
        flats.append(a2)
    m, n = flats[0].shape
    out = pl.pallas_call(
        kernel_body,
        grid=(m // tile_m, n // tile_n),
        in_specs=[pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j))
                  for _ in flats],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*flats)
    return jnp.ravel(out)[:size].reshape(shape)


@functools.partial(jax.jit, static_argnames=("params", "tile_m", "tile_n",
                                             "interpret"))
def q8vadd_pallas(a_u8, b_u8, params: AddQuantParams, *, tile_m: int = 256,
                  tile_n: int = 1024, interpret: bool = False):
    """Quantized elementwise add, bit-identical to quant.requantize
    .add_quantize (the q8vadd ukernel contract)."""
    # Mosaic vectors are signed: operands arrive biased to int8 and are
    # un-biased in int32 in-kernel (add_quantize accepts int32 inputs).
    def body(a_ref, b_ref, o_ref):
        a = a_ref[...].astype(jnp.int32) + 128
        b = b_ref[...].astype(jnp.int32) + 128
        o_ref[...] = add_quantize(a, b, params)
    return _elementwise_pallas(body, jnp.uint8, tile_m, tile_n, interpret,
                               u8_to_biased_i8(a_u8), u8_to_biased_i8(b_u8))


@functools.partial(jax.jit, static_argnames=("params", "tile_m", "tile_n",
                                             "interpret"))
def u8clamp_pallas(x_u8, params: ClampParams, *, tile_m: int = 256,
                   tile_n: int = 1024, interpret: bool = False):
    """uint8 clamp (u8clamp ukernel contract)."""
    def body(x_ref, o_ref):
        x = x_ref[...].astype(jnp.int32) + 128
        o_ref[...] = jnp.clip(x, params.output_min,
                              params.output_max).astype(jnp.uint8)
    return _elementwise_pallas(body, jnp.uint8, tile_m, tile_n, interpret,
                               u8_to_biased_i8(x_u8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def u8rmax_pallas(x_u8, *, interpret: bool = False):
    """Per-row uint8 max-reduce [B, N] -> [B] (u8rmax ukernel contract,
    the softargmax pass 1)."""
    x = u8_to_biased_i8(x_u8)  # signed max == unsigned max after biasing
    b, n = x.shape
    # 8-row tiles (sublane alignment); -128 row padding is max-neutral.
    x = pad_to_multiple(x, 0, 8, value=-128)
    bp = x.shape[0]

    def body(x_ref, o_ref):
        # Widen before the max: Mosaic legalizes vector max at 32 bit only.
        m = jnp.max(x_ref[...].astype(jnp.int32) + 128, axis=1,
                    keepdims=True)
        o_ref[...] = jnp.broadcast_to(m, (8, 128)).astype(jnp.uint8)

    out = pl.pallas_call(
        body,
        grid=(bp // 8,),
        in_specs=[pl.BlockSpec((8, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.uint8),
        interpret=interpret,
    )(x)
    return out[:b, 0]
