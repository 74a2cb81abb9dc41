#!/usr/bin/env python
"""On-chip sweep: Pallas q8gemm tiles vs the XLA dot_general path.

Produces the committed evidence behind the GEMM dispatch rule
(nn.gemm.gemm_path reading TuneParams.pallas_gemm_threshold) - the
init.c:53-84 measured-selection discipline.  NOTE: the round-3 output of
this script was deleted in round 4 (its capability rows predated harness
fix #3, yielding impossible >100% pct_cap values; see BENCH_NOTES.md) -
the committed routing evidence now lives in BENCH_GEMM_CROSSOVER.json and
BENCH_GEMM_SMALL.json.  Re-running this script regenerates a sound sweep
with the current two-point harness.  Writes BENCH_GEMM_PATHS.json
at the repo root with per-shape {path: {gops, disp, pct_cap}} rows plus the
same-day capability peaks the pct is computed against (the chip in this
environment does not run at nominal rate every day; see BENCH_NOTES.md).

Usage: python scripts/bench_gemm_paths.py [--quick]
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
                   "BENCH_GEMM_PATHS.json")

# (m, n, k): the 4096^3 flagship, MobileNet 1x1 layers (bench/q8gemm.cc
# shapes), and a mid square.  The tile sweep runs on the no-zero-point
# variant (the kzp path adds a fixed VPU row-sum term that does not change
# the tile optimum); the winning tile is then re-measured with kzp != 0.
SHAPES = [(4096, 4096, 4096), (1024, 1024, 1024),
          (3136, 256, 256), (784, 1280, 320)]
TILES = [(1024, 512, 1024), (2048, 1024, 1024),
         (2048, 512, 1024), (512, 512, 1024)]


def cap_probe():
    rng = np.random.default_rng(3)
    d = 4096
    ai = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)
    wi = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)

    def int8_dot(v):
        acc = jnp.matmul(v, wi, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    m = measure_loop(int8_dot, ai, chain=True)
    int8_tops = 2.0 * d**3 / m.seconds / 1e12
    x = jnp.asarray(rng.integers(0, 256, (256 * 1024 * 1024,),
                                 dtype=np.int64).astype(np.uint8))
    m2 = measure_loop(lambda v: v + jnp.uint8(1), x, chain=True)
    hbm = 2.0 * x.size / m2.seconds / 1e9
    return int8_tops, hbm


def main():
    quick = "--quick" in sys.argv
    shapes = SHAPES[:3] if quick else SHAPES
    tiles = TILES[:3] if quick else TILES
    int8_tops, hbm = cap_probe()
    print(f"capability: int8 {int8_tops:.1f} TOPS, HBM {hbm:.0f} GB/s",
          flush=True)

    rng = np.random.default_rng(1)
    rp = make_requant_params("fp32", 0.003, 128)
    out = {"cap_int8_tops": round(int8_tops, 1),
           "cap_hbm_gbps": round(hbm, 0),
           "date": "2026-08-21", "shapes": {}}
    for (m, n, k) in shapes:
        a = jnp.asarray(rng.integers(0, 256, (m, k),
                                     dtype=np.int64).astype(np.uint8))
        w = rng.integers(0, 256, (n, k), dtype=np.int64).astype(np.uint8)
        roof = max(2.0 * m * n * k / (int8_tops * 1e12),
                   (m * k + k * n + m * n) / (hbm * 1e9))
        # Size every path's loop identically from the roofline estimate
        # (saves the calibration compile; the sweep only needs relative
        # ordering at matched N).
        est = roof / 0.4  # assume paths land at >= 40% of roofline
        row = {}

        def add(name, fn, x):
            try:
                meas = measure_loop(fn, x, chain=(m == k and n == k),
                                    est_seconds=est)
            except Exception as e:  # noqa: BLE001
                row[name] = {"err": str(e)[:80]}
                return
            row[name] = {"gops": round(2.0 * m * n * k / meas.seconds / 1e9, 0),
                         "disp": round(meas.dispersion, 3),
                         "pct_cap": round(100.0 * roof / meas.seconds, 1)}
            print(f"{m}x{n}x{k} {name}: {row[name]}", flush=True)

        def pallas_variants(packed, tag, tile_list):
            seen = set()
            for (tm, tn, tk) in tile_list:
                # The kernel clamps tiles to the padded problem; skip
                # configs that collapse to an already-measured program.
                from qnnpack_tpu.nn.packing import round_up
                eff = (min(tm, round_up(m, 32)), min(tn, round_up(n, 128)),
                       min(tk, round_up(k, 128)))
                if eff in seen:
                    continue
                seen.add(eff)
                fn = functools.partial(q8gemm_pallas, packed=packed,
                                       rparams=rp, tile_m=tm, tile_n=tn,
                                       tile_k=tk)
                add(f"pallas{tag}_{tm}x{tn}x{tk}", fn, a)

        packed_nozp = pack_gemm_weights(w, None, 121, 128)
        add("xla_nozp", lambda v, p=packed_nozp: q8gemm(v, p, rp), a)
        pallas_variants(packed_nozp, "_nozp", tiles)
        # kzp != 0: XLA path and the leading tile only.
        packed = pack_gemm_weights(w, None, 121, 103)
        add("xla", lambda v, p=packed: q8gemm(v, p, rp), a)
        pallas_variants(packed, "", tiles[:1])
        out["shapes"][f"{m}x{n}x{k}"] = row

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
