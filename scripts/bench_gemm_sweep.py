#!/usr/bin/env python
"""q8gemm: Pallas kernel vs XLA lowering across shapes and tile configs.

The dispatch-threshold measurement run (init.c:69-84 analogue): for each
problem shape, time the XLA path and the Pallas kernel over a small tile
sweep, print GOPS and the winner, so config.TuneParams can carry measured
numbers instead of placeholders (VERDICT r1 next-#2).

Usage:  python scripts/bench_gemm_sweep.py [--quick]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.kernels.q8gemm import q8gemm_pallas
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.nn.packing import pack_gemm_weights
from qnnpack_tpu.nn.requant_dispatch import make_requant_params

RP = make_requant_params("fp32", 0.0007, 128)

# MobileNet-layer shapes (bench/q8gemm.cc list), BERT FC shapes, square peaks.
SHAPES = [
    # (M, N, K)           role
    (3136, 256, 256),     # mobilenet conv-as-gemm, mid
    (12544, 96, 16),      # b1 expand (tiny K)
    (784, 1280, 320),     # head
    (4096, 4096, 4096),   # square peak
    (8192, 4096, 4096),   # large-M peak
    (512 * 384, 1024, 1024),  # BERT-base FFN b512 s384 analogue... (M=196608)
]

TILES = [
    (256, 256, 512),
    (512, 512, 512),
    (512, 512, 1024),
    (512, 1024, 512),
    (1024, 512, 1024),
    (256, 512, 2048),
]

KZP = int(os.environ.get("KZP", "103"))  # 128 -> exercises the no-rowsum path


def timeit(fn, a, iters=16):
    def make(n):
        @jax.jit
        def loop(x0):
            def body(i, s):
                v = x0 ^ (i & 3).astype(jnp.uint8)
                y = fn(v)
                return s + jnp.sum(y[::137, ::137], dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop
    n1, n2 = max(iters // 4, 1), iters
    t = {}
    for n in (n1, n2):
        loop = make(n)
        loop(a).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            loop(a).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    for (m, n, k) in SHAPES:
        a = jnp.asarray(rng.integers(0, 256, (m, k),
                                     dtype=np.int64).astype(np.uint8))
        w = rng.integers(0, 256, (n, k), dtype=np.int64).astype(np.uint8)
        packed = pack_gemm_weights(w, None, 121, KZP)
        gop = 2.0 * m * n * k / 1e9
        print(f"\n[M={m} N={n} K={k}]  {gop:.1f} GOP  kzp={KZP}")

        dt = timeit(lambda v: q8gemm(v, packed, RP), a)
        best = ("xla", dt)
        print(f"  xla                  {dt*1e3:9.3f} ms  {gop/dt:9.0f} GOPS")

        for (tm, tn, tk) in (TILES[:3] if quick else TILES):
            if tm > m * 2 or tn > n * 2 or tk > k * 2:
                continue
            try:
                dt = timeit(lambda v, tm=tm, tn=tn, tk=tk: q8gemm_pallas(
                    v, packed, RP, tile_m=tm, tile_n=tn, tile_k=tk), a)
                tag = f"pallas {tm}x{tn}x{tk}"
                print(f"  {tag:20s} {dt*1e3:9.3f} ms  {gop/dt:9.0f} GOPS")
                if dt < best[1]:
                    best = (tag, dt)
            except Exception as e:
                print(f"  pallas {tm}x{tn}x{tk}  FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
        print(f"  => winner: {best[0]}  ({gop/best[1]:.0f} GOPS)")


if __name__ == "__main__":
    main()
