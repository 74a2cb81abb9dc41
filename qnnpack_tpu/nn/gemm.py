"""Quantized GEMM: the compute core of FC / 1x1-conv / conv-as-GEMM.

Functional XLA implementation of the reference's q8gemm microkernel contract
(src/q8gemm/, ukernel typedef src/qnnpack/params.h:267-277): uint8 activations
x packed weights -> int32 accumulator with zero-point algebra -> fused
requantization -> uint8.

The int8 x int8 -> int32 `dot` maps straight onto the MXU; everything else is
a VPU epilogue that XLA fuses.  A hand-tuned Pallas version with the epilogue
fused into the matmul's final K step lives in kernels/q8gemm.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .dtypes import u8_to_biased_i8
from .packing import PackedGemmWeights
from .requant_dispatch import apply_requant


def q8gemm_acc(a_u8, packed: PackedGemmWeights):
    """int32 accumulator of the quantized GEMM: [..., K] x [K, N] -> [..., N].

    Bit-identical to the reference accumulator sum_k (a - za)(w - zw) + bias.

    Takes the activations at their natural rank and contracts the trailing
    axis in place: a 1x1 conv stays NHWC and the contraction runs over C.
    Collapsing (B, H, W, C) -> (BHW, C) first - what the reference's
    setup does to reuse the GEMM ukernel (fully-connected.c:149-158) -
    forces an XLA relayout copy of the whole activation tensor, which at
    MobileNet's small channel counts runs 20-55x slower than the matmul it
    feeds (measured on v5e, scripts/bench_1x1.py).
    """
    a = u8_to_biased_i8(a_u8)  # [..., K] int8
    contract = (((a.ndim - 1,), (0,)), ((), ()))
    if packed.kzp_biased != 0 and packed.w_aug is not None:
        # Single-pass zero-point path: contract against [W | ones] so the
        # activation row sums come out as the last output column of the
        # SAME matmul - one HBM pass over A.  The separate rank-1 row-sum
        # product re-read A from HBM, a measured ~8% tax at 4096^3
        # (BENCH_r03 q8gemm_4096 86.8% vs _nozp 94.5% pct_cap); this is
        # the reference's XZP a_sum precompute (operator-run.c:711-768)
        # expressed as a fused MXU column.
        acc_full = lax.dot_general(a, packed.w_aug, contract,
                                   preferred_element_type=jnp.int32)
        row_sums = acc_full[..., -1:]
        return (acc_full[..., :-1] + packed.bias_folded
                - jnp.int32(packed.kzp_biased) * row_sums)
    acc = lax.dot_general(a, packed.w, contract,
                          preferred_element_type=jnp.int32)
    acc = acc + packed.bias_folded
    if packed.kzp_biased != 0:
        # Dynamic zero-point term; computed as a rank-1 MXU product rather
        # than a VPU reduction (A @ ones is cheaper than a widening sum).
        ones = jnp.ones((a.shape[-1], 1), jnp.int8)
        row_sums = lax.dot_general(a, ones, contract,
                                   preferred_element_type=jnp.int32)
        acc = acc - jnp.int32(packed.kzp_biased) * row_sums
    return acc


def q8gemm(a_u8, packed: PackedGemmWeights, rparams):
    """Full quantized GEMM: uint8 [..., K] -> uint8 [..., N]."""
    return apply_requant(q8gemm_acc(a_u8, packed), rparams)


def _pad_waste(dim: int, tile: int, granularity: int) -> float:
    """Padded-to-tile size over logical size for one GEMM dimension
    (mirrors the clamping in kernels.q8gemm.q8gemm_pallas)."""
    from .packing import round_up
    eff_tile = min(tile, round_up(dim, granularity))
    return round_up(dim, eff_tile) / dim


def gemm_path(shape, packed: PackedGemmWeights, rparams, *,
              backend=None, mode=None, tune=None) -> str:
    """Decide "xla" / "pallas" / "pallas_small" for a GEMM call - the
    measured dispatch rule replacing the reference's per-uarch kernel table
    entry (src/init.c:53-84 picks the q8gemm ukernel and the XZP kthreshold
    per microarchitecture; here the table is config.TuneParams, filled from
    the committed BENCH_GEMM_CROSSOVER.json / BENCH_GEMM_SMALL.json sweeps).

    Measured v5e rule (2026-08-21): large-tile Pallas (kernels/q8gemm.py)
    iff
        threshold <= M*N*K <= ceiling   (2^30 .. 2^31: above ~2*1024^3
                                         XLA's scheduling catches up)
        AND min(M, N, K) >= min_dim (1024)
        AND tile-padding waste <= max_pad_waste (1.05)
    Small-shape Pallas (kernels/q8gemm_small.py) iff the large window did
    not hit AND pallas_small_gemm is enabled for this generation AND the
    measured fat-N win region applies: K <= 1536 AND N >= 1280 AND
    M >= 512 AND (N >= 2048 OR M <= 4096) AND the kernel's minimum VMEM
    working set fits (kernels.q8gemm_small.small_gemm_fits_vmem - the
    whole-W-resident design caps K*N).  Measured v5e
    (BENCH_GEMM_SMALL.json): +22% at 784x1280x320, +40..70% at
    {512,2048}x3072x768, tie at 6272x1280x320, XLA wins all N < 1280.
    XLA otherwise.

    Both Pallas kernels require 2-D activations (rank > 2 runs the
    natural-rank XLA contraction, which avoids a relayout copy).  The
    large-tile kernel additionally requires per-tensor requantization;
    the small kernel handles per-channel scales natively (its epilogue
    takes the scale vector as a BlockSpec'd input), so imported-TFLite
    per-channel models are eligible for routing.  `mode`
    (config.pallas_mode) can force paths; "always" is interpreted off-TPU
    so CI can exercise the route.  `tune` overrides the probed TuneParams
    record (tests).
    """
    from ..config import config, tune_params
    from ..quant.params import PerChannelFP32Params
    mode = config.pallas_mode if mode is None else mode
    if mode not in ("auto", "never", "always"):
        raise ValueError(f"bad pallas_mode {mode!r}")
    if len(shape) != 2:
        return "xla"
    per_channel = isinstance(rparams, PerChannelFP32Params)
    if mode == "never":
        return "xla"
    if mode == "always":
        return "pallas_small" if per_channel else "pallas"
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return "xla"
    tp = tune_params() if tune is None else tune
    m, (n, k) = shape[0], (packed.n, packed.k)
    mnk = m * n * k
    # kzp != 0 raises the window ceiling: XLA's dynamic-zp epilogue
    # dependency costs it 2048^3 (+21% Pallas win, confirmed twice -
    # BENCH_GEMM_CROSSOVER.json round5_kzp) while nozp keeps the tighter
    # ceiling (XLA wins 2048^3 there by 19%).
    ceiling = (tp.pallas_gemm_ceiling_kzp if packed.kzp_biased != 0
               else tp.pallas_gemm_ceiling)
    if (not per_channel and tp.pallas_gemm_threshold is not None
            and tp.pallas_gemm_threshold <= mnk <= ceiling
            and min(m, n, k) >= tp.pallas_gemm_min_dim):
        waste = (_pad_waste(m, tp.gemm_tile_m, 32)
                 * _pad_waste(n, tp.gemm_tile_n, 128)
                 * _pad_waste(k, tp.gemm_tile_k, 128))
        if waste <= tp.pallas_gemm_max_pad_waste:
            return "pallas"
    if (tp.pallas_small_gemm and k <= tp.pallas_small_max_k
            and n >= tp.pallas_small_min_n and m >= tp.pallas_small_min_m
            and (n >= tp.pallas_small_fat_n
                 or m <= tp.pallas_small_max_m_mid_n)):
        # VMEM feasibility: the small kernel keeps the whole W [K, N] (plus
        # bias/scale rows and a tile_m x N int32 accumulator) resident, and
        # its tile_m halving bottoms out at 32 - a vocab-style FC
        # (e.g. 512 x 768 x 30522, K*N ~ 22 MB) passes every threshold
        # above but cannot compile, so reject it here.
        from ..kernels.q8gemm_small import small_gemm_fits_vmem
        if small_gemm_fits_vmem(k, n):
            return "pallas_small"
    return "xla"


def q8gemm_routed(a_u8, packed: PackedGemmWeights, rparams):
    """Quantized GEMM with measured kernel routing (see gemm_path)."""
    path = gemm_path(a_u8.shape, packed, rparams)
    if path == "pallas":
        from ..config import tune_params
        from ..kernels.q8gemm import q8gemm_pallas
        tp = tune_params()
        return q8gemm_pallas(
            a_u8, packed, rparams, tile_m=tp.gemm_tile_m,
            tile_n=tp.gemm_tile_n, tile_k=tp.gemm_tile_k,
            interpret=jax.default_backend() != "tpu")
    if path == "pallas_small":
        from ..config import tune_params
        from ..kernels.q8gemm_small import q8gemm_small_pallas
        tp = tune_params()
        return q8gemm_small_pallas(
            a_u8, packed, rparams, tile_m=tp.small_tile_m,
            interpret=jax.default_backend() != "tpu")
    return q8gemm(a_u8, packed, rparams)


def q8gemm_row_sums_out(a_u8, packed: PackedGemmWeights, rparams):
    """Producer half of the XZP-style a_sum fusion (the reference's
    precompute, operator-run.c:711-768, done one op earlier): returns
    (y_u8, row_sums) where row_sums[m] = sum_n (y[m, n] - 128) - exactly
    the biased row sums the NEXT kzp != 0 GEMM needs for its zero-point
    term.  XLA fuses the reduction into this op's requant epilogue, so y
    streams to HBM once and the row sums cost one tiny [M] store.

    Measured role (BENCH_ZP_TAX.json round-5 update): feeding these into
    q8gemm_presummed breaks the consumer's epilogue dependency on the
    accumulator's last column - the one thing that kept the single-pass
    w_aug path below the >= 90%-of-capability target."""
    y = q8gemm(a_u8, packed, rparams)
    rs = (jnp.sum(y.astype(jnp.int32), axis=-1)
          - jnp.int32(128 * y.shape[-1]))
    return y, rs


def q8gemm_presummed(a_u8, row_sums_i32, packed: PackedGemmWeights, rparams):
    """Consumer half: quantized GEMM with the dynamic kernel-zero-point
    row sums PRECOMPUTED by the producer (q8gemm_row_sums_out).  The
    requant epilogue depends only on each output tile's own accumulator
    columns, so it fuses into the matmul exactly like the kzp == 0 case.
    Bit-identical to q8gemm (the row-sum term is the same integer)."""
    a = u8_to_biased_i8(a_u8)
    contract = (((a.ndim - 1,), (0,)), ((), ()))
    acc = lax.dot_general(a, packed.w, contract,
                          preferred_element_type=jnp.int32)
    acc = acc + packed.bias_folded
    if packed.kzp_biased != 0:
        acc = acc - jnp.int32(packed.kzp_biased) * row_sums_i32[..., None]
    return apply_requant(acc, rparams)


def q8bmm_acc(a_u8, b_u8, a_zero_point: int, b_zero_point: int):
    """Dynamic quantized matmul accumulator: both operands are activations.

    [..., M, K] x [..., K, N] -> int32 [..., M, N], computing exactly
    sum_k (a - za)(b - zb).  The reference has no activation x activation
    operator (its GEMM B side is always prepacked weights); this extends the
    same biased-int8 zero-point algebra to both sides, which is what an int8
    attention score/context matmul needs (BASELINE.json BERT config)."""
    from .dtypes import biased_zero_point
    a = u8_to_biased_i8(a_u8)
    b = u8_to_biased_i8(b_u8)
    za = biased_zero_point(a_zero_point)
    zb = biased_zero_point(b_zero_point)
    k = a.shape[-1]
    acc = jnp.matmul(a, b, preferred_element_type=jnp.int32)
    if zb != 0:
        row_sums = jnp.sum(a.astype(jnp.int32), axis=-1, keepdims=True)
        acc = acc - jnp.int32(zb) * row_sums
    if za != 0:
        col_sums = jnp.sum(b.astype(jnp.int32), axis=-2, keepdims=True)
        acc = acc - jnp.int32(za) * col_sums
    if za != 0 and zb != 0:
        acc = acc + jnp.int32(k * za * zb)
    return acc


def q8bmm(a_u8, b_u8, a_zero_point: int, b_zero_point: int, rparams):
    """Dynamic quantized batched matmul: uint8 x uint8 -> uint8."""
    return apply_requant(
        q8bmm_acc(a_u8, b_u8, a_zero_point, b_zero_point), rparams)
