"""Serving runtime tests: continuous batching correctness + telemetry, and
heartbeat failure detection (SURVEY.md section 5.3/5.8 capability)."""

import threading

import numpy as np

import jax
import jax.numpy as jnp

from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.nn.packing import pack_gemm_weights
from qnnpack_tpu.nn.requant_dispatch import make_requant_params
from qnnpack_tpu.serving import HealthMonitor, InferenceServer

RNG = np.random.default_rng(0xCAFE)


def _make_model(dim=32, n_out=16):
    w = RNG.integers(0, 256, (n_out, dim), dtype=np.uint8)
    b = RNG.integers(-100, 100, (n_out,), dtype=np.int64).astype(np.int32)
    packed = pack_gemm_weights(w, b, 121, 103)
    rp = make_requant_params("fp32", 0.01, 128)

    @jax.jit
    def forward(x):
        return q8gemm(x, packed, rp)

    return forward


def test_continuous_batching_matches_direct():
    dim = 32
    forward = _make_model(dim)
    server = InferenceServer(forward, (dim,), max_batch=8).start()
    try:
        xs = RNG.integers(0, 256, (20, dim), dtype=np.uint8)
        futures = [server.submit(x) for x in xs]
        got = np.stack([f.result(timeout=120) for f in futures])
        want = np.asarray(forward(jnp.asarray(xs)))
        np.testing.assert_array_equal(got, want)
        assert server.stats.requests == 20
        assert server.stats.batches >= 1
        assert 0 < server.stats.occupancy <= 1.0
        assert server.stats.latency_percentile(50) > 0
    finally:
        server.stop()


def test_batching_concurrent_clients():
    dim = 32
    forward = _make_model(dim)
    server = InferenceServer(forward, (dim,), max_batch=16,
                             batch_timeout_s=0.01).start()
    results = {}
    xs = RNG.integers(0, 256, (32, dim), dtype=np.uint8)

    def client(i):
        results[i] = server.infer(xs[i], timeout=120)

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        want = np.asarray(forward(jnp.asarray(xs)))
        for i in range(32):
            np.testing.assert_array_equal(results[i], want[i])
        # Coalescing happened: fewer device steps than requests.
        assert server.stats.batches < 32
    finally:
        server.stop()


def test_backpressure_sheds_overload():
    """Admission control (VERDICT r4 weak #7): a full bounded queue makes
    submit() fail fast with ServerOverloadedError instead of queueing
    without bound; accepted requests still complete correctly and the
    rejection count is surfaced in stats."""
    import time

    import pytest

    from qnnpack_tpu.serving import ServerOverloadedError

    dim = 32
    fwd = _make_model(dim)

    def slow_forward(x):
        time.sleep(0.25)  # hold the dispatcher so the queue can fill
        return fwd(x)

    server = InferenceServer(slow_forward, (dim,), max_batch=2,
                             max_queue=4, batch_timeout_s=0.0).start()
    try:
        xs = RNG.integers(0, 256, (64, dim), dtype=np.uint8)
        accepted, rejected = [], 0
        for i in range(64):
            try:
                accepted.append((i, server.submit(xs[i])))
            except ServerOverloadedError:
                rejected += 1
        assert rejected > 0
        assert server.stats.rejected == rejected
        want = np.asarray(fwd(jnp.asarray(xs)))
        for i, f in accepted:
            np.testing.assert_array_equal(f.result(timeout=120), want[i])
        # block=True opts back into throttling (no rejection).
        f = server.submit(xs[0], block=True)
        np.testing.assert_array_equal(f.result(timeout=120), want[0])
    finally:
        server.stop()


def test_server_rejects_bad_shape():
    forward = _make_model(32)
    server = InferenceServer(forward, (32,)).start()
    try:
        import pytest
        with pytest.raises(ValueError, match="sample shape"):
            server.submit(np.zeros((7,), np.uint8))
    finally:
        server.stop()


def test_health_monitor_probe_and_recovery():
    events = []
    mon = HealthMonitor(interval_s=0.05, deadline_s=30.0,
                        on_failure=lambda: events.append("failed"))
    assert mon.probe_once() is True
    assert mon.healthy and mon.probes == 1 and mon.failures == 0

    # Inject a failure: zero deadline makes any real probe "too slow".
    mon._deadline_s = 0.0
    assert mon.probe_once() is False
    assert not mon.healthy and events == ["failed"]

    # Recovery flips it back.
    mon._deadline_s = 30.0
    assert mon.probe_once() is True
    assert mon.healthy
