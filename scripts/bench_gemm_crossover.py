#!/usr/bin/env python
"""Focused XLA-vs-Pallas q8gemm crossover measurement.

BENCH_GEMM_PATHS.json (full sweep) showed Pallas winning at 1024^3 and XLA
winning at 4096^3 - but also that the chip's delivered rate drifts by ~2x
over minutes in this environment, which can fake a crossover.  This script
pins that down: for each square shape it re-probes the int8-dot capability
IMMEDIATELY before the paths (the probe program is compile-cached, so a
re-probe costs ~2s) and measures the paths back-to-back, so the xla/pallas
ratio and the pct-of-capability are drift-controlled.  kzp=103 (the
common asymmetric case).  Writes BENCH_GEMM_CROSSOVER.json - the artifact
behind TuneParams.pallas_gemm_threshold / pallas_gemm_ceiling.
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
from qnnpack_tpu.kernels.q8gemm import q8gemm_pallas
from qnnpack_tpu.utils.timing import measure_loop

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_GEMM_CROSSOVER.json")

SIZES = [1024, 1448, 2048, 2896, 4096]
TILES = [(1024, 1024, 1024), (1024, 512, 1024)]

_cap_state = {}


def cap_probe():
    """int8-dot capability; program is cached after the first call."""
    if "args" not in _cap_state:
        rng = np.random.default_rng(3)
        d = 4096
        _cap_state["args"] = (
            jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                        jnp.int8),
            jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                        jnp.int8))

    ai, wi = _cap_state["args"]

    def int8_dot(v):
        acc = jnp.matmul(v, wi, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    m = measure_loop(int8_dot, ai, chain=True, est_seconds=1e-3,
                     min_seconds=0.2, repeats=3)
    return 2.0 * 4096**3 / m.seconds / 1e12


def main():
    rng = np.random.default_rng(1)
    rp = make_requant_params("fp32", 0.003, 128)
    out = {"date": "2026-08-21", "kzp": 103, "sizes": {}}
    for d in SIZES:
        a = jnp.asarray(rng.integers(0, 256, (d, d),
                                     dtype=np.int64).astype(np.uint8))
        w = rng.integers(0, 256, (d, d), dtype=np.int64).astype(np.uint8)
        packed = pack_gemm_weights(w, None, 121, 103)
        flops = 2.0 * d**3
        paths = {"xla": lambda v: q8gemm(v, packed, rp)}
        for (tm, tn, tk) in TILES:
            paths[f"pallas_{tm}x{tn}x{tk}"] = functools.partial(
                q8gemm_pallas, packed=packed, rparams=rp,
                tile_m=tm, tile_n=tn, tile_k=tk)
        cap = cap_probe()
        row = {"cap_int8_tops": round(cap, 1)}
        est = flops / (cap * 1e12) / 0.6
        for name, fn in paths.items():
            try:
                meas = measure_loop(fn, a, chain=True, est_seconds=est,
                                    min_seconds=0.2, repeats=5)
                row[name] = {
                    "gops": round(flops / meas.seconds / 1e9, 0),
                    "disp": round(meas.dispersion, 3),
                    "pct_cap": round(100.0 * flops / (cap * 1e12)
                                     / meas.seconds, 1)}
            except Exception as e:  # noqa: BLE001
                row[name] = {"err": str(e)[:80]}
            print(f"{d}^3 {name}: {row[name]}", flush=True)
        # Post-check drift: re-probe and keep both numbers.
        row["cap_int8_tops_after"] = round(cap_probe(), 1)
        out["sizes"][str(d)] = row
        print(f"{d}^3 cap drift: {row['cap_int8_tops']} -> "
              f"{row['cap_int8_tops_after']}", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
