"""Serving runtime: continuous batching, health checks, metrics.

The reference is a per-operator library driven by a caller's loop
(README.md:58-147 benchmarks through Caffe2's speed_benchmark); serving
infrastructure is out of its scope.  For the TPU build it is in scope
(SURVEY.md section 5.3/5.8): large-batch MXU efficiency only materializes if
something coalesces concurrent requests into device-sized batches.

Components:
  - BatchingQueue/InferenceServer: continuous batching - requests arrive
    individually, a dispatcher coalesces everything pending (up to
    max_batch) into one device step, pads to a fixed bucket size so every
    step hits a cached jit executable, and fans results back out through
    futures.  Bucketing is the serving-time analogue of the reference's
    shape-keyed setup cache (SURVEY.md 3.3).
  - Admission control / backpressure: the submit queue is bounded and
    submit() REJECTS (ServerOverloadedError) instead of blocking when it
    is full.  Without shedding, deep overload degrades throughput below
    saturation - measured on the serving bench: 191.7 img/s achieved at
    2k offered fell to 80.1 at 10k offered (BENCH_SERVING.json pre-fix
    overload rows) because unbounded producer-side work starves the
    dispatcher; with a bounded queue the dispatcher always drains at the
    device's saturation rate and excess load fails fast with a clear
    error, which is also what keeps worst-case latency bounded at
    ~queue_depth / throughput.
  - HealthMonitor: heartbeat failure detection - a background probe runs a
    trivial device op each interval; a missed/slow/failed probe flips the
    server to unhealthy and fires a recovery callback (the multi-host
    analogue re-runs jax.distributed.initialize on slice restart).
  - Telemetry counters: requests, batches, mean occupancy, latency
    percentiles - the observability the reference delegates to clog-level
    logging (src/qnnpack/log.h).
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

import jax
import jax.numpy as jnp

from .utils.logging import log_error, log_info


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class ServerOverloadedError(RuntimeError):
    """submit() admission rejection: the bounded request queue is full.

    Clients should shed the request or retry with backoff; this is the
    explicit-status philosophy of the reference's qnnp_status codes
    (include/qnnpack.h:24-32) applied to overload."""


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    rows_computed: int = 0
    rows_useful: int = 0
    rejected: int = 0  # admission-control rejections (queue full)
    # Sliding window: percentiles over the most recent max_latency_samples
    # completions, so a long-lived server's memory stays bounded.
    max_latency_samples: int = 65536
    latencies_ms: "collections.deque" = None  # set in __post_init__

    def __post_init__(self):
        if self.latencies_ms is None:
            self.latencies_ms = collections.deque(
                maxlen=self.max_latency_samples)

    @property
    def occupancy(self) -> float:
        """Useful rows / computed rows (padding waste complement)."""
        return self.rows_useful / max(self.rows_computed, 1)

    def latency_percentile(self, p: float) -> float:
        if not self.latencies_ms:
            return 0.0
        return float(np.percentile(np.asarray(self.latencies_ms), p))


class InferenceServer:
    """Continuous-batching server around a jittable forward(x) -> y.

    forward must accept a uint8 batch [n, ...sample_shape] for every n in
    `buckets` (first call per bucket compiles and is cached thereafter).
    """

    def __init__(self, forward, sample_shape, *, max_batch: int = 64,
                 buckets=None, max_queue: int = 1024,
                 batch_timeout_s: float = 0.002):
        self._forward = forward
        self._sample_shape = tuple(sample_shape)
        if buckets is None:
            buckets = []
            b = 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self._buckets = sorted(set(buckets))
        self._max_batch = self._buckets[-1]
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._batch_timeout_s = batch_timeout_s
        self.stats = ServerStats()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name="qnnpack-tpu-dispatcher",
                                        daemon=True)
        self._started = False
        self._lock = threading.Lock()

    # -- client API -------------------------------------------------------
    def start(self):
        if not self._started:
            self._started = True
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._started:
            self._thread.join(timeout=5.0)

    def submit(self, x: np.ndarray, *, block: bool = False) -> Future:
        """Enqueue one sample [..., sample_shape]; returns a Future of the
        result row.

        Admission control (default): when the bounded queue is full the
        request is REJECTED with ServerOverloadedError rather than queued
        or blocked on - unbounded acceptance under deep overload measurably
        degrades throughput below saturation (module docstring / pre-fix
        BENCH_SERVING.json overload rows).  ``block=True`` opts into the
        old producer-blocks behavior for closed-loop clients that prefer
        throttling to errors."""
        if tuple(x.shape) != self._sample_shape:
            raise ValueError(
                f"sample shape {x.shape} != expected {self._sample_shape}")
        fut: Future = Future()
        item = (np.asarray(x), time.perf_counter(), fut)
        try:
            if block:
                self._queue.put(item)
            else:
                self._queue.put_nowait(item)
        except queue.Full:
            with self._lock:
                self.stats.rejected += 1
            raise ServerOverloadedError(
                f"request queue full ({self._queue.maxsize} pending); "
                "shed or retry with backoff") from None
        return fut

    def infer(self, x: np.ndarray, timeout: float = 60.0):
        """Blocking single-sample convenience wrapper (throttles rather
        than rejects: a caller already blocking on the result wants
        backpressure, not an error)."""
        return self.submit(x, block=True).result(timeout=timeout)

    # -- dispatcher -------------------------------------------------------
    def _drain(self):
        """Collect everything pending (>=1, <= max_batch), waiting briefly
        so concurrent arrivals coalesce."""
        items = []
        try:
            items.append(self._queue.get(timeout=0.05))
        except queue.Empty:
            return items
        deadline = time.perf_counter() + self._batch_timeout_s
        while len(items) < self._max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _dispatch_loop(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            n = len(items)
            b = _bucket(n, self._buckets)
            batch = np.zeros((b,) + self._sample_shape, np.uint8)
            for i, (x, _, _) in enumerate(items):
                batch[i] = x
            try:
                y = self._forward(jnp.asarray(batch))
                y = np.asarray(jax.device_get(y))
            except Exception as exc:  # noqa: BLE001 - fan failure out
                log_error("serving batch failed: %s", exc)
                for _, _, fut in items:
                    fut.set_exception(exc)
                continue
            now = time.perf_counter()
            with self._lock:
                self.stats.requests += n
                self.stats.batches += 1
                self.stats.rows_computed += b
                self.stats.rows_useful += n
                for _, t0, _ in items:
                    self.stats.latencies_ms.append((now - t0) * 1e3)
            for i, (_, _, fut) in enumerate(items):
                fut.set_result(y[i])


class HealthMonitor:
    """Heartbeat failure detector for the serving device(s).

    Probes the device with a trivial computation every `interval_s`; if the
    probe raises or exceeds `deadline_s`, the monitor marks the system
    unhealthy and calls `on_failure` (e.g. re-create the server, or re-run
    jax.distributed.initialize after a slice restart).
    """

    def __init__(self, *, interval_s: float = 5.0, deadline_s: float = 30.0,
                 on_failure=None, devices=None):
        self._interval_s = interval_s
        self._deadline_s = deadline_s
        self._on_failure = on_failure
        self._devices = devices
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop,
                                        name="qnnpack-tpu-heartbeat",
                                        daemon=True)
        self.healthy = True
        self.probes = 0
        self.failures = 0

    def probe_once(self) -> bool:
        """One synchronous heartbeat: device round-trip of a tiny op."""
        t0 = time.perf_counter()
        try:
            devices = self._devices or jax.devices()
            for d in devices:
                v = jax.device_put(jnp.ones((8,), jnp.int32), d)
                float(jnp.sum(v))
            ok = (time.perf_counter() - t0) <= self._deadline_s
        except Exception as exc:  # noqa: BLE001 - any device error = failure
            log_error("heartbeat probe failed: %s", exc)
            ok = False
        self.probes += 1
        if not ok:
            self.failures += 1
            if self.healthy:
                self.healthy = False
                log_error("device marked UNHEALTHY after failed heartbeat")
                if self._on_failure is not None:
                    self._on_failure()
        else:
            if not self.healthy:
                log_info("device recovered; marking healthy")
            self.healthy = True
        return ok

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=self._interval_s + 1.0)

    def _loop(self):
        while not self._stop.wait(self._interval_s):
            self.probe_once()
