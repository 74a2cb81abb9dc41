"""Device-mesh scaling: the TPU-native replacement for pthreadpool.

The reference's only parallelism is intra-op fork-join over host threads
(pthreadpool_compute_* in operator-run.c).  Here the same role - and the
multi-chip scaling the reference never had - is played by a 2-axis
`jax.sharding.Mesh`:

  - "data":  batch-sharded inference (DP), the primary throughput axis
  - "model": output-channel-sharded weights (TP); int32 partial sums are
             combined by XLA-inserted collectives *before* requantization,
             and integer addition is exact, so sharding never changes bits

Spatial halo sharding (the reference's per-output-row task split,
operator-run.c:675-679, generalized across chips via ppermute) is the
CP-analogue and lands with the large-image path (SURVEY.md 2.2).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.conv import PackedConvWeights
from ..nn.packing import PackedGemmWeights


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
