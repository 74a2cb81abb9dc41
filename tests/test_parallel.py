"""Multi-device sharding tests on the 8-device virtual CPU mesh: DP, TP, and
DPxTP execution of MobileNetV2 must be bit-identical to single-device
execution (integer partial sums are exact, so sharding never changes bits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,
                                             mobilenet_v2_forward)
from qnnpack_tpu.parallel import (batch_sharding, make_mesh, shard_params,
                                  sharded_inference_fn)

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _build_tiny():
    rng = np.random.default_rng(21)
    params, spec = build_mobilenet_v2(
        rng, input_size=32, num_classes=16, requant="fp32",
        cfg=[(1, 8, 1, 1), (6, 16, 2, 2)], stem_channels=8, head_channels=64)
    x = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.int64).astype(np.uint8)
    return params, spec, x


@requires_8_devices
@pytest.mark.parametrize("n_data,n_model", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_sharded_matches_single_device(n_data, n_model):
    params, spec, x = _build_tiny()
    want = np.asarray(jax.jit(
        lambda p, v: mobilenet_v2_forward(p, spec, v))(params, jnp.asarray(x)))

    mesh = make_mesh(n_data, n_model)
    sharded = shard_params(params, mesh)
    fwd = sharded_inference_fn(
        lambda p, v: mobilenet_v2_forward(p, spec, v), mesh)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    got = np.asarray(fwd(sharded, xs))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError, match="do not factor"):
        make_mesh(3, 2)
