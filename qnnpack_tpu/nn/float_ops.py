"""Float compute paths: fp32 GEMM/conv/depthwise and the bf16 GEMM.

TPU-native equivalents of the reference's float microkernel families, which
exist there as forward-looking kernels covered only by tests/benches
(SURVEY.md 2.1C):

  sgemm   (src/sgemm/{5x8,6x8}-neon.c, 6x8-psimd.c; params.h:326-346)
  sconv   (src/sconv/6x8-psimd.c)
  sdwconv (src/sdwconv/up4x9-psimd.c)
  hgemm   (src/hgemm/8x8-neonfp16arith.c + .S)

Design notes:
  - All four carry the reference's clamping-params contract (output_min/max
    folded into the kernel epilogue, struct qnnp_fp32_clamping_params /
    qnnp_fp16_clamping_params, params.h:455-470).
  - fp32 matmuls run on the MXU with float32 accumulation; XLA tiles them -
    a hand kernel adds nothing over `jnp.dot` for dense fp32.
  - The fp16 family maps to **bfloat16**, the TPU-native 16-bit float: bf16
    operands, fp32 MXU accumulation, bf16 store.  IEEE fp16 storage is
    supported for import/export, but compute in bf16 is the idiomatic (and
    faster) choice on this hardware.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sgemm(a, w, bias=None, output_min=float("-inf"),
          output_max=float("inf")):
    """fp32 GEMM with fused bias + clamp: [M, K] x [K, N] -> [M, N].

    The sgemm ukernel contract (params.h:326-331): accumulate in fp32,
    clamp to [output_min, output_max] before the store."""
    a = jnp.asarray(a, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    acc = jnp.dot(a, w, preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.float32)[None, :]
    return jnp.clip(acc, output_min, output_max)


def hgemm(a, w, bias=None, output_min=float("-inf"),
          output_max=float("inf")):
    """16-bit GEMM (hgemm analogue): bf16 operands, fp32 accumulation,
    bf16 result with fused bias + clamp.

    The reference's 8x8 NEON-fp16 kernel accumulates in fp16
    (src/hgemm/8x8-neonfp16arith.c); on TPU the MXU natively consumes bf16
    and accumulates fp32, which strictly tightens the numerics."""
    a = jnp.asarray(a, jnp.bfloat16)
    w = jnp.asarray(w, jnp.bfloat16)
    acc = jnp.dot(a, w, preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.float32)[None, :]
    return jnp.clip(acc, output_min, output_max).astype(jnp.bfloat16)


def sconv2d(a, w_hwio, bias=None, strides=(1, 1), padding=((0, 0), (0, 0)),
            dilation=(1, 1), groups: int = 1, output_min=float("-inf"),
            output_max=float("inf")):
    """fp32 conv NHWC x HWIO -> NHWC with fused bias + clamp (sconv
    ukernel contract)."""
    a = jnp.asarray(a, jnp.float32)
    w_hwio = jnp.asarray(w_hwio, jnp.float32)
    acc = lax.conv_general_dilated(
        a, w_hwio, window_strides=strides,
        padding=padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.float32)[None, None, None, :]
    return jnp.clip(acc, output_min, output_max)


def sdwconv2d(a, w_hwc, bias=None, strides=(1, 1), padding=((0, 0), (0, 0)),
              dilation=(1, 1), output_min=float("-inf"),
              output_max=float("inf")):
    """fp32 depthwise conv: NHWC x [Kh, Kw, C] -> NHWC (sdwconv up4x9
    contract)."""
    w_hwc = jnp.asarray(w_hwc, jnp.float32)
    kh, kw, c = w_hwc.shape
    return sconv2d(a, w_hwc.reshape(kh, kw, 1, c), bias, strides, padding,
                   dilation, groups=c, output_min=output_min,
                   output_max=output_max)
