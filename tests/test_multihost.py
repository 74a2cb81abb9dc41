"""Multi-host module tests on the single-process 8-device virtual mesh.

Real DCN cannot be exercised in one process; what IS testable here is the
whole single-process degradation path plus the pieces that are
process-count-independent: mesh construction, per-host batch assembly
(process_count==1 means local == global, which must round-trip exactly),
and the SliceRecovery snapshot/recover cycle with a simulated device loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,
                                             mobilenet_v2_forward)
from qnnpack_tpu.parallel import (SliceRecovery, batch_sharding,
                                  distributed_init, host_local_batch_to_global,
                                  make_hybrid_mesh, shard_params,
                                  sharded_inference_fn)

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_distributed_init_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed_init() is False
    assert distributed_init(num_processes=1) is False


@requires_8_devices
@pytest.mark.parametrize("n_model", [1, 2, 4])
def test_hybrid_mesh_single_process(n_model):
    mesh = make_hybrid_mesh(n_model)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == n_model
    assert mesh.shape["data"] * n_model == len(jax.devices())


def test_hybrid_mesh_rejects_bad_factor():
    with pytest.raises(ValueError):
        make_hybrid_mesh(3)


@requires_8_devices
def test_host_local_batch_round_trip():
    mesh = make_hybrid_mesh(2)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (8, 5, 7), dtype=np.int64).astype(np.uint8)
    g = host_local_batch_to_global(x, mesh)
    assert g.shape == x.shape  # process_count == 1: local is global
    np.testing.assert_array_equal(np.asarray(jax.device_get(g)), x)


@requires_8_devices
def test_slice_recovery_round_trip():
    rng = np.random.default_rng(9)
    params, spec = build_mobilenet_v2(
        rng, input_size=32, num_classes=16, requant="fp32",
        cfg=[(1, 8, 1, 1), (6, 16, 2, 2)], stem_channels=8, head_channels=64)
    x = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3),
                                 dtype=np.int64).astype(np.uint8))

    rec = SliceRecovery.snapshot(params, shard_params, n_model=2)
    fwd = sharded_inference_fn(
        lambda p, v: mobilenet_v2_forward(p, spec, v), rec.mesh)
    xs = jax.device_put(x, batch_sharding(rec.mesh))
    want = np.asarray(jax.device_get(fwd(rec.device_params, xs)))

    # Simulate a slice failure: drop the device state entirely, then recover.
    rec.device_params = None
    new_params = rec.recover()
    assert rec.recoveries == 1
    fwd2 = sharded_inference_fn(
        lambda p, v: mobilenet_v2_forward(p, spec, v), rec.mesh)
    xs2 = jax.device_put(x, batch_sharding(rec.mesh))
    got = np.asarray(jax.device_get(fwd2(new_params, xs2)))
    np.testing.assert_array_equal(got, want)


@requires_8_devices
def test_health_monitor_triggers_recovery():
    """HealthMonitor.on_failure -> SliceRecovery.recover wiring."""
    from qnnpack_tpu.serving import HealthMonitor

    rng = np.random.default_rng(4)
    params = {"w": rng.integers(0, 255, (4, 4), dtype=np.int64).astype(
        np.uint8)}
    rec = SliceRecovery.snapshot(
        params, lambda p, mesh: jax.tree.map(jnp.asarray, p))

    mon = HealthMonitor(deadline_s=-1.0, on_failure=rec.recover)
    assert mon.probe_once() is False  # deadline < 0 -> guaranteed failure
    assert mon.healthy is False
    assert rec.recoveries == 1
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(rec.device_params["w"])), params["w"])
