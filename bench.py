#!/usr/bin/env python
"""Benchmark driver: quantized MobileNetV2 + q8gemm on one TPU chip.

Reproduces the reference's headline workload (quantized MobileNet v2
1.0_224, batch 1, warmup + timed iters - README.md:63-85) plus a batched
variant and q8gemm microkernel rows (bench/q8gemm.cc analogue, GOPS =
2*M*N*K / iteration time).

Measurement method: qnnpack_tpu.utils.timing.measure_loop - the two-point
scan method: the workload runs inside jitted lax.scan loops of n and 2n
iterations and per-iteration time is (median t(2n) - median t(n)) / n,
which cancels both the per-dispatch overhead and the ~25 ms fixed
per-execution cost of scan programs on this backend, with n sized so the
difference clears the measured noise floor (harness fix #3, BENCH_NOTES.md).
Every row carries a `*_disp` dispersion stat (summed loop spreads over the
differenced delta).

Device capability rows (`cap_*`) measure the SAME-DAY attainable peaks
(bf16 matmul, int8 dot, HBM copy) so GOPS rows can be read as a fraction of
what the chip actually delivers at measurement time - this environment's
chip has been observed to run at about half its nominal rate on some days
(nominal v5e: 394 int8 TOPS / 197 bf16 TFLOPS / 819 GB/s), which uniformly
scales every row; `*_pct_cap` is the state-independent signal.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "details": ...}
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,  # noqa: E402
                                             mobilenet_v2_forward)
from qnnpack_tpu.nn import make_requant_params, pack_gemm_weights  # noqa: E402
from qnnpack_tpu.nn.gemm import gemm_path, q8gemm_routed  # noqa: E402
from qnnpack_tpu.utils.timing import measure_loop  # noqa: E402

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def capability_probe(details):
    """Same-day attainable peaks; see module docstring."""
    rng = np.random.default_rng(3)
    d = 4096
    ab = jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
    m = measure_loop(
        lambda v: jnp.matmul(v, wb, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16), ab, chain=True)
    details["cap_bf16_tflops"] = round(2.0 * d**3 / m.seconds / 1e12, 1)
    details["cap_bf16_disp"] = round(m.dispersion, 3)

    ai = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)
    wi = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)

    def int8_dot(v):
        acc = jnp.matmul(v, wi, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)  # minimal consumable epilogue

    m = measure_loop(int8_dot, ai, chain=True)
    int8_tops = 2.0 * d**3 / m.seconds / 1e12
    details["cap_int8_tops"] = round(int8_tops, 1)
    details["cap_int8_disp"] = round(m.dispersion, 3)

    x = jnp.asarray(rng.integers(0, 256, (256 * 1024 * 1024,),
                                 dtype=np.int64).astype(np.uint8))
    m = measure_loop(lambda v: v + jnp.uint8(1), x, chain=True)
    hbm_gbps = 2.0 * x.size / m.seconds / 1e9
    details["cap_hbm_gbps"] = round(hbm_gbps, 0)
    details["cap_hbm_disp"] = round(m.dispersion, 3)
    return int8_tops, hbm_gbps


def bench_mobilenet(batch):
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=224, requant="fp32")
    x = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))
    m = measure_loop(lambda v: mobilenet_v2_forward(params, spec, v), x)
    return batch / m.seconds, m


def bench_q8gemm(details, key, m, n, k, kzp, int8_tops, hbm_gbps):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 256, (m, k),
                                 dtype=np.int64).astype(np.uint8))
    w = rng.integers(0, 256, (n, k), dtype=np.int64).astype(np.uint8)
    packed = pack_gemm_weights(w, None, 121, kzp)
    rp = make_requant_params("fp32", 0.003, 128)
    meas = measure_loop(lambda v: q8gemm_routed(v, packed, rp), a,
                        chain=(m == k))
    gops = 2.0 * m * n * k / meas.seconds / 1e9
    roofline_s = max(2.0 * m * n * k / (int8_tops * 1e12),
                     (m * k + k * n + m * n) / (hbm_gbps * 1e9))
    details[f"{key}_gops"] = round(gops, 0)
    details[f"{key}_disp"] = round(meas.dispersion, 3)
    details[f"{key}_pct_cap"] = round(100.0 * roofline_s / meas.seconds, 1)
    details[f"{key}_path"] = gemm_path((m, k), packed, rp)


def main():
    details = {}
    int8_tops, hbm_gbps = capability_probe(details)

    ips_b1, m_b1 = bench_mobilenet(batch=1)
    details["mobilenet_v2_224_b1_images_per_sec"] = round(ips_b1, 1)
    details["mobilenet_v2_224_b1_latency_ms"] = round(m_b1.seconds * 1e3, 3)
    details["mobilenet_v2_224_b1_disp"] = round(m_b1.dispersion, 3)

    ips_b128, m_b128 = bench_mobilenet(batch=128)
    details["mobilenet_v2_224_b128_images_per_sec"] = round(ips_b128, 1)
    details["mobilenet_v2_224_b128_disp"] = round(m_b128.dispersion, 3)

    bench_q8gemm(details, "q8gemm_4096", 4096, 4096, 4096, 103,
                 int8_tops, hbm_gbps)
    bench_q8gemm(details, "q8gemm_4096_nozp", 4096, 4096, 4096, 128,
                 int8_tops, hbm_gbps)
    bench_q8gemm(details, "q8gemm_3136x256x256", 3136, 256, 256, 103,
                 int8_tops, hbm_gbps)
    # This isolated row sits on the measured ~3-4 us per-program execution
    # floor (its roofline is 2.5 us): see BENCH_GEMM_SMALL.json
    # floor_analysis - in situ the same layer class runs without the
    # floor (MobileNetV2 b128 e2e attains 90% of its summed per-layer
    # roofline, PROFILE_B128.md).
    details["q8gemm_3136x256x256_note"] = "isolation-floor-bound; see BENCH_GEMM_SMALL.json floor_analysis"

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
