"""Device-mesh scaling: the TPU-native replacement for pthreadpool.

The reference's only parallelism is intra-op fork-join over host threads
(pthreadpool_compute_* in operator-run.c).  Here the same role - and the
multi-chip scaling the reference never had - is played by a 2-axis
`jax.sharding.Mesh`:

  - "data":  batch-sharded inference (DP), the primary throughput axis
  - "model": tensor parallelism, two layouts:
      (a) output-channel (N-dim) weight sharding via shard_params - each
          device computes a full-K slice of output channels, so the compute
          path needs no collective (activations all-gather at layer
          boundaries as XLA sees fit);
      (b) contraction-dim (K-dim) sharding via gemm_kdim_tp / conv_ic_tp -
          each device holds a K-slice of weights and activations, computes
          an int32 partial accumulator, and the partials are combined with
          `psum` *before* the requantization epilogue.  This mirrors the
          reference's accumulate-int32-then-requantize kernel contract
          (src/q8conv/4x8-neon.c epilogue ordering) across chips, and since
          integer addition is exact, sharding never changes bits.

Spatial halo sharding (the reference's per-output-row task split,
operator-run.c:675-679, generalized across chips via ppermute) is the
CP-analogue and lives in parallel/halo.py (SURVEY.md 2.2).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.conv import PackedConvWeights
from ..nn.dtypes import u8_to_biased_i8
from ..nn.packing import PackedGemmWeights
from ..nn.requant_dispatch import apply_requant


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{len(devices)} devices do not factor into data={n_data} x "
        f"model={n_model}")
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _param_spec(p):
    """Partition spec for one packed-weight record: shard output channels
    over the "model" axis (weights stationary, TP epilogue via psum)."""
    if isinstance(p, PackedGemmWeights):
        return PackedGemmWeights(
            w=P(None, "model"), bias_folded=P("model"),
            k=p.k, n=p.n, input_zero_point=p.input_zero_point,
            kernel_zero_point=p.kernel_zero_point)
    if isinstance(p, PackedConvWeights):
        return PackedConvWeights(
            w=P(None, None, None, "model"), bias_folded=P("model"),
            kernel_height=p.kernel_height, kernel_width=p.kernel_width,
            group_input_channels=p.group_input_channels,
            group_output_channels=p.group_output_channels, groups=p.groups,
            input_zero_point=p.input_zero_point,
            kernel_zero_point=p.kernel_zero_point)
    return None


def _shardable(p, mesh: Mesh) -> bool:
    """Only shard channel dims that divide the model axis; grouped/depthwise
    conv channel blocks must not split a group."""
    n_model = mesh.shape["model"]
    if n_model == 1:
        return False
    if isinstance(p, PackedGemmWeights):
        return p.n % n_model == 0
    if isinstance(p, PackedConvWeights):
        if p.groups > 1:
            return p.groups % n_model == 0
        return p.group_output_channels % n_model == 0
    return False


def shard_params(params, mesh: Mesh):
    """device_put a packed-params pytree with TP shardings over `mesh`."""
    out = []
    for p in params:
        if p is None:
            out.append(None)
            continue
        if _shardable(p, mesh):
            if isinstance(p, PackedGemmWeights) and p.w_aug is not None:
                # The single-pass augmentation appends a ones column to W;
                # under output-channel TP that column would land on one
                # shard only, so drop it and keep the two-pass row-sum
                # (its relative cost shrinks with the sharded N anyway).
                p = dataclasses.replace(p, w_aug=None)
            spec = _param_spec(p)
            shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
        else:
            shardings = jax.tree.map(
                lambda _: NamedSharding(mesh, P()), p)
        out.append(jax.device_put(p, shardings))
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC (or NC) input sharded along batch over the "data" axis."""
    return NamedSharding(mesh, P("data"))


def sharded_inference_fn(forward, mesh: Mesh):
    """jit a forward(params, x) for mesh execution: x batch-sharded over
    "data", params as placed by shard_params, output batch-sharded."""
    return jax.jit(
        forward,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh))


# --- K-dim tensor parallelism: int32 psum before requantization -----------

def gemm_kdim_tp(a_u8, packed: PackedGemmWeights, rparams, mesh: Mesh,
                 axis: str = "model"):
    """Quantized GEMM with the contraction dim sharded over `axis`.

    Each device computes the int32 partial accumulator of its K-slice -
    including its slice of the dynamic kernel-zero-point row-sum term - and
    the partials are `psum`-combined BEFORE the requantization epilogue
    (SURVEY.md 7.4 hard-part #5; the reference's int32-accumulate-then-
    requantize contract, src/q8conv/4x8-neon.c epilogue ordering).  Integer
    partial sums commute exactly, so the result is bit-identical to the
    single-device nn.gemm.q8gemm.

    a_u8 [M, K] uint8; K must divide mesh.shape[axis].  Output is
    replicated over `axis` (and whatever sharding M arrives with is kept by
    the caller's jit context).
    """
    n_shards = mesh.shape[axis]
    if packed.k % n_shards != 0:
        raise ValueError(
            f"K={packed.k} does not divide over {n_shards} '{axis}' shards")
    kzp = packed.kzp_biased

    def local(a_blk, w_blk, bias):
        # a_blk [M, K/n] uint8, w_blk [K/n, N] int8 (pre-biased at pack).
        ab = u8_to_biased_i8(a_blk)
        acc = jnp.dot(ab, w_blk, preferred_element_type=jnp.int32)
        if kzp != 0:
            ones = jnp.ones((ab.shape[-1], 1), jnp.int8)
            rs = jnp.dot(ab, ones, preferred_element_type=jnp.int32)
            acc = acc - jnp.int32(kzp) * rs
        acc = lax.psum(acc, axis)           # int32 partials -> exact total
        return apply_requant(acc + bias[None, :], rparams)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P()),
        out_specs=P(),
        check_vma=False)
    return fn(a_u8, packed.w, packed.bias_folded)


def conv_ic_tp(a_u8, packed: PackedConvWeights, rparams, mesh: Mesh,
               axis: str = "model", strides=(1, 1),
               padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """Quantized conv with input channels sharded over `axis` (ungrouped).

    Same int32-psum-before-requantization contract as gemm_kdim_tp, for the
    general conv path: each device convolves its input-channel slice of the
    activations with the matching kernel slice, partial int32 accumulators
    are psum'd, and the requant epilogue runs on the exact total.
    """
    if packed.groups != 1:
        raise ValueError("conv_ic_tp shards input channels; grouped conv "
                         "shards over groups instead (parallel/expert.py)")
    n_shards = mesh.shape[axis]
    if packed.group_input_channels % n_shards != 0:
        raise ValueError(
            f"input channels {packed.group_input_channels} do not divide "
            f"over {n_shards} '{axis}' shards")
    kzp = packed.kzp_biased
    izp = packed.izp_biased
    kh, kw = packed.kernel_height, packed.kernel_width

    def local(a_blk, w_blk, bias):
        # a_blk [B, H, W, C/n] uint8; w_blk [Kh, Kw, C/n, O] int8.
        ab = u8_to_biased_i8(a_blk)
        (pt, pb), (pl_, pr) = padding
        if pt or pb or pl_ or pr:
            ab = jnp.pad(ab, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                         constant_values=izp)
        acc = lax.conv_general_dilated(
            ab, w_blk, window_strides=strides, padding="VALID",
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        if kzp != 0:
            ch_sums = jnp.sum(ab.astype(jnp.int32), axis=-1, keepdims=True)
            s_a = lax.reduce_window(
                ch_sums, jnp.int32(0), lax.add,
                window_dimensions=(1, kh, kw, 1),
                window_strides=(1, strides[0], strides[1], 1),
                window_dilation=(1, dilation[0], dilation[1], 1),
                padding="VALID")
            acc = acc - jnp.int32(kzp) * s_a
        acc = lax.psum(acc, axis)
        return apply_requant(acc + bias[None, None, None, :], rparams)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis, None), P()),
        out_specs=P(),
        check_vma=False)
    return fn(a_u8, packed.w, packed.bias_folded)
