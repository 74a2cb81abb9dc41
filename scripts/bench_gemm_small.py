#!/usr/bin/env python
"""Small-shape (skinny, model-class) q8gemm: XLA vs the small-tile Pallas
kernel, drift-controlled.

VERDICT r3 missing #3: XLA runs the GEMM shapes real models actually have
(CNN 1x1 layers: N, K <= 1280) at 39-65% of the same-day roofline, and the
large-tile Pallas window excludes them by construction.  This sweep
measures kernels/q8gemm_small.py (K untiled, M-only grid, VMEM-resident W)
against the XLA path at exactly those shapes, each row with a same-minute
HBM + int8 capability re-probe, and reports pct of the per-shape roofline
max(flops/tops, bytes/bw) - these shapes are all HBM- or
launch-overhead-bound, so pct-of-compute-capability would be meaningless.
Writes BENCH_GEMM_SMALL.json - the artifact behind
TuneParams.pallas_small_gemm.  Shapes mirror the reference's MobileNet
layer sweep (bench/q8gemm.cc:248-350 uses MobileNet v1/v2 layer shapes as
THE GEMM benchmark).
"""
import functools
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.nn import make_requant_params, pack_gemm_weights
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.kernels.q8gemm_small import q8gemm_small_pallas
from qnnpack_tpu.utils.timing import measure_loop

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_GEMM_SMALL.json")

# (M, N, K): the skinny model class.  b1 rows (M = H*W) and b128-ish rows
# (M = 128 * H*W for the late layers where HW is small).
SHAPES = [
    (3136, 256, 256),     # the BENCH_r03 39%-of-roofline row
    (784, 1280, 320),     # MobileNetV2 head 1x1 (b1, 28x28 grid)
    (3136, 128, 576),     # MNv2 mid expand/project class
    (12544, 96, 24),      # MNv2 early expand (b1 112x112)
    (6272, 160, 576),     # b128 x 7x7 late block
    (25088, 320, 1280),   # b128 head class (196*128)
    (12544, 256, 256),    # b4 of the 39% row
    (128, 768, 768),      # BERT-base QKV projection, seq 128 b1
    (512, 3072, 768),     # BERT FFN up, seq 128 b4
]

TILE_MS = [512, 1024, 2048]

_cap = {}


def cap_probe():
    """Same-minute int8 TOPS + HBM GB/s (programs cached after 1st call)."""
    if "a" not in _cap:
        rng = np.random.default_rng(3)
        d = 4096
        _cap["a"] = jnp.asarray(
            rng.integers(0, 256, (d, d), dtype=np.int64) - 128, jnp.int8)
        _cap["w"] = jnp.asarray(
            rng.integers(0, 256, (d, d), dtype=np.int64) - 128, jnp.int8)
        _cap["x"] = jnp.asarray(rng.integers(
            0, 256, (128 * 1024 * 1024,), dtype=np.int64).astype(np.uint8))
    wi = _cap["w"]
    m = measure_loop(
        lambda v: (jnp.matmul(v, wi, preferred_element_type=jnp.int32)
                   >> 8).astype(jnp.int8),
        _cap["a"], chain=True, est_seconds=1e-3, min_seconds=0.2, repeats=3)
    tops = 2.0 * 4096**3 / m.seconds / 1e12
    m2 = measure_loop(lambda v: v + jnp.uint8(1), _cap["x"], chain=True,
                      est_seconds=5e-4, min_seconds=0.2, repeats=3)
    gbps = 2.0 * _cap["x"].size / m2.seconds / 1e9
    return tops, gbps


def main():
    rng = np.random.default_rng(1)
    rp = make_requant_params("fp32", 0.003, 128)
    out = {"date": "2026-08-21", "kzp": 103,
           "device": jax.devices()[0].device_kind, "rows": {}}
    for (m_, n_, k_) in SHAPES:
        a = jnp.asarray(rng.integers(0, 256, (m_, k_),
                                     dtype=np.int64).astype(np.uint8))
        w = rng.integers(0, 256, (n_, k_), dtype=np.int64).astype(np.uint8)
        packed = pack_gemm_weights(w, None, 121, 103)
        flops = 2.0 * m_ * n_ * k_
        nbytes = m_ * k_ + k_ * n_ + m_ * n_ + 4 * n_
        tops, gbps = cap_probe()
        roof_s = max(flops / (tops * 1e12), nbytes / (gbps * 1e9))
        key = f"{m_}x{n_}x{k_}"
        row = {"cap_int8_tops": round(tops, 1),
               "cap_hbm_gbps": round(gbps, 0),
               "roofline_us": round(roof_s * 1e6, 2),
               "bound": ("MXU" if flops / (tops * 1e12)
                         > nbytes / (gbps * 1e9) else "HBM")}
        paths = {"xla": lambda v: q8gemm(v, packed, rp)}
        for tm in TILE_MS:
            if tm <= m_ * 2:
                paths[f"pallas_small_m{tm}"] = functools.partial(
                    q8gemm_small_pallas, packed=packed, rparams=rp,
                    tile_m=tm)
        for name, fn in paths.items():
            try:
                meas = measure_loop(fn, a, est_seconds=max(roof_s, 2e-6) / 0.3,
                                    min_seconds=0.2, repeats=5)
                row[name] = {
                    "us": round(meas.seconds * 1e6, 2),
                    "gops": round(flops / meas.seconds / 1e9, 0),
                    "disp": round(meas.dispersion, 3),
                    "pct_roof": round(100.0 * roof_s / meas.seconds, 1)}
            except Exception as e:  # noqa: BLE001
                row[name] = {"err": str(e)[:100]}
            print(f"{key} {name}: {row[name]}", flush=True)
        out["rows"][key] = row

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
