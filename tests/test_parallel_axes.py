"""Parallelism-axis tests on the 8-device virtual CPU mesh (SURVEY.md 2.2):

  SP  - spatial halo-exchange conv (parallel/halo.py) vs unsharded conv
  PP  - fill-drain pipeline (parallel/pipeline.py) vs sequential stages
  EP  - group-sharded grouped conv (parallel/expert.py) vs unsharded conv

All must be bit-identical to single-device execution: halo exchange moves
bytes losslessly, pipeline stages see identical activations, and group
sharding touches disjoint channel slices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from qnnpack_tpu.nn.conv import pack_conv_weights, q8conv2d
from qnnpack_tpu.nn.gemm import q8gemm_acc
from qnnpack_tpu.nn.packing import pack_gemm_weights
from qnnpack_tpu.nn.requant_dispatch import apply_requant, make_requant_params
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.parallel.expert import grouped_conv2d_ep
from qnnpack_tpu.parallel.halo import spatial_conv2d
from qnnpack_tpu.parallel.mesh import conv_ic_tp, gemm_kdim_tp
from qnnpack_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

RNG = np.random.default_rng(0x5EED)


def _mesh_1d(n, axis="sp"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


@requires_8_devices
@pytest.mark.parametrize("kh,s,pt,pb", [(3, 1, 1, 1), (3, 2, 1, 0),
                                        (5, 1, 2, 2)])
@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_spatial_halo_conv_bit_exact(kh, s, pt, pb, n_shards):
    h = 32
    x = RNG.integers(0, 256, (2, h, 12, 8), dtype=np.uint8)
    k = RNG.integers(0, 256, (16, kh, kh, 8), dtype=np.uint8)
    bias = RNG.integers(-500, 500, (16,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, 103)
    rp = make_requant_params("fp32", 0.004, 117)
    pad = ((pt, pb), (kh // 2, kh // 2))

    want = np.asarray(q8conv2d(jnp.asarray(x), packed, rp,
                               strides=(s, s), padding=pad))
    mesh = _mesh_1d(n_shards)
    got = np.asarray(spatial_conv2d(jnp.asarray(x), packed, rp, mesh,
                                    axis="sp", strides=(s, s), padding=pad))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
def test_spatial_conv_rejects_uneven_split():
    x = jnp.zeros((1, 30, 8, 8), jnp.uint8)
    k = RNG.integers(0, 256, (8, 3, 3, 8), dtype=np.uint8)
    packed = pack_conv_weights(k, None, 121, 103)
    rp = make_requant_params("fp32", 0.004, 117)
    with pytest.raises(ValueError, match="must divide"):
        spatial_conv2d(x, packed, rp, _mesh_1d(4), axis="sp",
                       strides=(2, 2), padding=((1, 0), (1, 1)))


@requires_8_devices
@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (8, 3)])
def test_pipeline_bit_exact(n_stages, n_micro):
    """Pipelined quantized FC stack == sequential application."""
    mb, dim = 4, 32
    rp = make_requant_params("q31", 0.01, 128)

    stage_params = []
    for i in range(n_stages):
        w = RNG.integers(0, 256, (dim, dim), dtype=np.uint8)
        b = RNG.integers(-100, 100, (dim,), dtype=np.int64).astype(np.int32)
        stage_params.append(pack_gemm_weights(w, b, 121, 103))
    stacked = stack_stage_params(stage_params)

    def stage_fn(packed, x):
        return apply_requant(q8gemm_acc(x, packed), rp)

    x = RNG.integers(0, 256, (n_micro, mb, dim), dtype=np.uint8)

    want = []
    for m in range(n_micro):
        v = jnp.asarray(x[m])
        for p in stage_params:
            v = stage_fn(p, v)
        want.append(np.asarray(v))
    want = np.stack(want)

    mesh = _mesh_1d(n_stages, axis="pp")
    got = np.asarray(pipeline_apply(stage_fn, stacked, jnp.asarray(x), mesh,
                                    axis="pp"))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("scheme", ["q31", "fp32"])
@pytest.mark.parametrize("kzp", [103, 128])  # biased -25 (row-sum path) / 0
def test_tp_kdim_bit_exact(n_shards, scheme, kzp):
    """K-sharded GEMM: int32 partials psum'd BEFORE requantization must be
    bit-identical to the single-device kernel (SURVEY.md 7.4 #5)."""
    m, n, k = 6, 24, 64
    a = RNG.integers(0, 256, (m, k), dtype=np.uint8)
    w = RNG.integers(0, 256, (n, k), dtype=np.uint8)
    bias = RNG.integers(-500, 500, (n,), dtype=np.int64).astype(np.int32)
    packed = pack_gemm_weights(w, bias, 121, kzp)
    rp = make_requant_params(scheme, 0.004, 117)

    want = np.asarray(q8gemm(jnp.asarray(a), packed, rp))
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]).reshape(1, n_shards),
                ("data", "model"))
    got = np.asarray(gemm_kdim_tp(jnp.asarray(a), packed, rp, mesh))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
def test_tp_kdim_rejects_uneven_k():
    a = jnp.zeros((2, 30), jnp.uint8)
    w = RNG.integers(0, 256, (8, 30), dtype=np.uint8)
    packed = pack_gemm_weights(w, None, 121, 103)
    rp = make_requant_params("fp32", 0.004, 117)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "model"))
    with pytest.raises(ValueError, match="does not divide"):
        gemm_kdim_tp(a, packed, rp, mesh)


@requires_8_devices
@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("kzp", [103, 128])
def test_tp_conv_ic_bit_exact(n_shards, kzp):
    """Input-channel-sharded conv: psum of int32 partials before requant."""
    c, o = 16, 12
    x = RNG.integers(0, 256, (2, 9, 9, c), dtype=np.uint8)
    k = RNG.integers(0, 256, (o, 3, 3, c), dtype=np.uint8)
    bias = RNG.integers(-500, 500, (o,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, kzp)
    rp = make_requant_params("q31", 0.004, 117)
    pad = ((1, 1), (1, 1))

    want = np.asarray(q8conv2d(jnp.asarray(x), packed, rp,
                               strides=(2, 2), padding=pad))
    mesh = Mesh(np.asarray(jax.devices()[:n_shards]).reshape(1, n_shards),
                ("data", "model"))
    got = np.asarray(conv_ic_tp(jnp.asarray(x), packed, rp, mesh,
                                strides=(2, 2), padding=pad))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
@pytest.mark.parametrize("groups,n_shards", [(8, 2), (8, 8), (4, 4)])
def test_grouped_conv_ep_bit_exact(groups, n_shards):
    icpg, ocpg = 4, 6
    c = groups * icpg
    o = groups * ocpg
    x = RNG.integers(0, 256, (2, 10, 10, c), dtype=np.uint8)
    k = RNG.integers(0, 256, (o, 3, 3, icpg), dtype=np.uint8)
    bias = RNG.integers(-500, 500, (o,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(k, bias, 121, 103, groups=groups)
    rp = make_requant_params("q31", 0.004, 117)
    pad = ((1, 1), (1, 1))

    want = np.asarray(q8conv2d(jnp.asarray(x), packed, rp, padding=pad))
    mesh = _mesh_1d(n_shards, axis="ep")
    got = np.asarray(grouped_conv2d_ep(jnp.asarray(x), packed, rp, mesh,
                                       axis="ep", padding=pad))
    np.testing.assert_array_equal(got, want)
