#!/usr/bin/env python
"""Probe: Pallas q8gemm tile sweep vs the XLA dot_general path, on-chip.

Measures marginal device time per GEMM via the same slope method as
bench.py, for the VERDICT r1 #2 work item: make q8gemm_pallas beat XLA,
then set config.pallas_gemm_threshold from data.
"""
import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.nn import make_requant_params, pack_gemm_weights
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.kernels.q8gemm import q8gemm_pallas


def time_loop(fn, x, iters=24):
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
        loop(x).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    shapes = [(4096, 4096, 4096, 24)] if os.environ.get("ONLY4096") else [(4096, 4096, 4096, 24),
              (3136, 256, 256, 200),
              (1024, 1024, 1024, 100),
              (12544, 96, 32, 200),   # mobilenet stem-ish
              (784, 1280, 320, 200)]  # mobilenet tail 1x1
    tiles = [(1024, 512, 1024), (1024, 1024, 1024), (2048, 512, 1024),
             (2048, 1024, 512), (1024, 512, 2048), (4096, 512, 512),
             (1536, 512, 1024), (2048, 512, 512), (512, 512, 1024)]
    kzp = int(os.environ.get("KZP", "103"))  # 128 => kzp_biased == 0 path
    rng = np.random.default_rng(1)
    out = {}
    for (m, n, k, iters) in shapes:
        a = jnp.asarray(rng.integers(0, 256, (m, k), dtype=np.int64).astype(np.uint8))
        w = rng.integers(0, 256, (n, k), dtype=np.int64).astype(np.uint8)
        packed = pack_gemm_weights(w, None, 121, kzp)
        rp = make_requant_params("fp32", 0.003, 128)
        gops = lambda dt: 2.0 * m * n * k / dt / 1e9
        row = {}
        dt = time_loop(lambda v: q8gemm(v, packed, rp), a, iters)
        row["xla"] = round(gops(dt), 1)
        for (tm, tn, tk) in tiles:
            if tm > m * 2 or tn > n * 2 or tk > k * 2:
                continue
            key = f"pallas_{tm}x{tn}x{tk}"
            try:
                fn = functools.partial(q8gemm_pallas, packed=packed, rparams=rp,
                                       tile_m=tm, tile_n=tn, tile_k=tk)
                dt = time_loop(fn, a, iters)
                row[key] = round(gops(dt), 1)
            except Exception as e:  # noqa: BLE001
                row[key] = f"err: {str(e)[:80]}"
        out[f"{m}x{n}x{k}"] = row
        print(json.dumps({f"{m}x{n}x{k}": row}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
