#!/usr/bin/env python
"""Benchmark driver: quantized MobileNetV2 on one TPU chip.

Reproduces the reference's headline workload (quantized MobileNet v2
1.0_224, batch 1, warmup + timed iters - README.md:63-85) plus a batched
variant and a q8gemm microkernel roofline probe (bench/q8gemm.cc analogue).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the ratio against the round-1 recorded value in
BENCH_BASELINE.json (created on first run), so later rounds track progress;
details of all sub-benchmarks ride along in "details".
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,  # noqa: E402
                                             mobilenet_v2_forward)
from qnnpack_tpu.nn import make_requant_params, pack_gemm_weights  # noqa: E402
from qnnpack_tpu.nn.gemm import q8gemm  # noqa: E402

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def time_loop(fn, x, iters):
    """Marginal device time per call via loop-in-jit at two iteration counts.

    The slope (t(N2) - t(N1)) / (N2 - N1) cancels the fixed per-dispatch
    overhead (tens of ms through the axon tunnel in this environment) and
    the full output is summed into the carry so XLA cannot slice-push-down
    through the matmuls.  Input is varied per iteration to defeat
    loop-invariant hoisting."""
    def make(n):
        @jax.jit
        def loop(x0):
            def body(i, s):
                v = x0 ^ (i & 3).astype(jnp.uint8)
                y = fn(v)
                return s + jnp.sum(y, dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    n1, n2 = max(iters // 4, 1), iters
    t = {}
    for n in (n1, n2):
        loop = make(n)
        loop(x).block_until_ready()  # compile + warmup
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


def bench_mobilenet(batch, iters):
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=224, requant="fp32")
    x = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))
    dt = time_loop(lambda v: mobilenet_v2_forward(params, spec, v), x, iters)
    return batch / dt, dt


def bench_q8gemm(m, n, k, iters=50):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 256, (m, k), dtype=np.int64).astype(np.uint8))
    w = rng.integers(0, 256, (n, k), dtype=np.int64).astype(np.uint8)
    packed = pack_gemm_weights(w, None, 121, 103)
    rp = make_requant_params("fp32", 0.003, 128)
    dt = time_loop(lambda v: q8gemm(v, packed, rp), a, iters)
    return 2.0 * m * n * k / dt / 1e9


def main():
    details = {}

    ips_b1, lat_b1 = bench_mobilenet(batch=1, iters=400)
    details["mobilenet_v2_224_b1_images_per_sec"] = round(ips_b1, 1)
    details["mobilenet_v2_224_b1_latency_ms"] = round(lat_b1 * 1e3, 3)

    ips_b128, _ = bench_mobilenet(batch=128, iters=20)
    details["mobilenet_v2_224_b128_images_per_sec"] = round(ips_b128, 1)

    details["q8gemm_4096_gops"] = round(bench_q8gemm(4096, 4096, 4096, 40), 0)
    details["q8gemm_3136x256x256_gops"] = round(
        bench_q8gemm(3136, 256, 256, 400), 0)

    value = details["mobilenet_v2_224_b1_images_per_sec"]
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        vs = round(value / base["value"], 3) if base.get("value") else 1.0
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "mobilenet_v2_224_b1_images_per_sec",
                       "value": value, "details": details}, f, indent=1)
        vs = 1.0

    print(json.dumps({
        "metric": "mobilenet_v2_224_b1_images_per_sec",
        "value": value,
        "unit": "images/sec",
        "vs_baseline": vs,
        "details": details,
    }))


if __name__ == "__main__":
    main()
