"""Weight packing with zero-point/bias folding.

TPU-native analogue of the reference's prepacking layer
(/root/reference/src/qnnpack/pack.h): instead of tile-major NEON panels we
produce an MXU-friendly [K, N] biased-int8 matrix plus a folded int32 bias
that absorbs every static zero-point cross term:

    bias'[n] = bias[n] - za' * sum_k W'[k, n] + K * za' * zw'

(the pack.h:24-43 identity, rewritten in the biased-int8 domain - see
nn/dtypes.py).  The only dynamic correction left for the kernel epilogue is
the per-row activation sum times the kernel zero point, which is the
MXU-native generalization of the reference's XZP row-sum path
(src/operator-run.c:711-768).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import biased_zero_point, u8_to_biased_i8


@partial(jax.tree_util.register_dataclass,
         data_fields=["w", "bias_folded", "w_aug"],
         meta_fields=["k", "n", "input_zero_point", "kernel_zero_point"])
@dataclasses.dataclass(frozen=True)
class PackedGemmWeights:
    """GEMM/FC/1x1-conv weights in MXU layout.

    w:           int8 [K, N]  biased (value - 128)
    bias_folded: int32 [N]    bias with all static zero-point terms folded in
    w_aug:       int8 [K, N+1] or None: `w` with a ones column appended, so
                 the dynamic zero-point row-sum term rides the SAME MXU pass
                 as the product (acc_full[..., -1] = row sums of A) instead
                 of a second HBM pass over the activations.  The MXU-native
                 form of the reference's XZP precomputed-a_sum idea
                 (src/operator-run.c:711-768).  Measured at 4096^3 on v5e
                 (BENCH_ZP_TAX.json): best kzp!=0 formulation, 425.3 us vs
                 433.9 two-pass / 429.3 VPU-rowsum; the residual 30.5 us
                 over the nozp row is the epilogue's dependency on the last
                 accumulator column (fusion analysis in that artifact), not
                 A traffic.  Built only when the kernel zero point is
                 nonzero (biased); costs one duplicate weight copy in HBM.
    k, n:        logical (unpadded) dims
    input_zero_point / kernel_zero_point: original uint8 zero points
    """

    w: jax.Array
    bias_folded: jax.Array
    k: int
    n: int
    input_zero_point: int
    kernel_zero_point: int
    w_aug: jax.Array | None = None

    @property
    def kzp_biased(self) -> int:
        return biased_zero_point(self.kernel_zero_point)


def pack_gemm_weights(kernel, bias, input_zero_point: int,
                      kernel_zero_point: int) -> PackedGemmWeights:
    """Pack FC/GEMM weights (pack_q8gemm_w analogue, pack.h:12-49).

    kernel: uint8 [N, K] (reference FC layout: [output_channels][input_channels],
            include/qnnpack.h:118-132)
    bias:   int32 [N] (or None for zero bias)
    """
    kernel = jnp.asarray(kernel, jnp.uint8)
    n, k = kernel.shape
    if bias is None:
        bias = jnp.zeros((n,), jnp.int32)
    bias = jnp.asarray(bias, jnp.int32)

    w = u8_to_biased_i8(kernel).T  # [K, N] int8
    za = biased_zero_point(input_zero_point)
    zw = biased_zero_point(kernel_zero_point)
    col_sums = jnp.sum(w.astype(jnp.int32), axis=0)  # [N]
    bias_folded = bias - jnp.int32(za) * col_sums + jnp.int32(k * za * zw)
    w_aug = (jnp.concatenate([w, jnp.ones((k, 1), jnp.int8)], axis=1)
             if zw != 0 else None)
    return PackedGemmWeights(w=w, bias_folded=bias_folded, k=int(k), n=int(n),
                             input_zero_point=int(input_zero_point),
                             kernel_zero_point=int(kernel_zero_point),
                             w_aug=w_aug)


def pad_to_multiple(x, axis: int, multiple: int, value=0):
    """Pad one axis up to a multiple (tile alignment; zero padding keeps the
    biased-int8 GEMM algebra exact because 0 contributes nothing to dot,
    row sums, or column sums)."""
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
