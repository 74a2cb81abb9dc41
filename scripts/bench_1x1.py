#!/usr/bin/env python
"""Compare 1x1-conv formulations at the b128 MobileNetV2 problem shapes.

The b128 profile showed reshape+dot 1x1 convs with K or N < 128 running
10-38x off the HBM roofline (lane underutilization).  Candidates:
  dot      current: reshape (B,H,W,C)->(BHW,C), jnp.dot
  dotg     dot_general contracting C without the reshape
  conv     lax.conv_general_dilated 1x1 NHWC
  packed   lane-packing: fold spatial rows into the lane dim so A reads
           are dense 128-lane vectors; W becomes block-diagonal kron(I_r, W)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.nn.dtypes import u8_to_biased_i8
from qnnpack_tpu.nn.requant_dispatch import apply_requant, make_requant_params

RP = make_requant_params("fp32", 0.002, 128, 128, 188)


def timeit(fn, x, iters=24):
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


def run_case(b, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (b, h, w, cin),
                                 dtype=np.int64).astype(np.uint8))
    wq = rng.integers(-128, 128, (cin, cout), dtype=np.int64).astype(np.int8)
    wj = jnp.asarray(wq)
    bias = jnp.asarray(rng.integers(-8000, 8000, (cout,),
                                    dtype=np.int64).astype(np.int32))

    def f_dot(v):
        a = u8_to_biased_i8(v).reshape(-1, cin)
        acc = jnp.dot(a, wj, preferred_element_type=jnp.int32) + bias
        return apply_requant(acc, RP).reshape(b, h, w, cout)

    def f_dotg(v):
        a = u8_to_biased_i8(v)
        acc = lax.dot_general(a, wj, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32) + bias
        return apply_requant(acc, RP)

    def f_conv(v):
        a = u8_to_biased_i8(v)
        acc = lax.conv_general_dilated(
            a, wj.reshape(1, 1, cin, cout), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32) + bias
        return apply_requant(acc, RP)

    # Lane packing: fold r spatial positions into lanes (r*cin <= 512).
    r = max(1, min(128 // cin if cin <= 128 else 1, 8))
    wk = jnp.asarray(np.kron(np.eye(r, dtype=np.int8), np.asarray(wq)))

    def f_packed(v):
        a = u8_to_biased_i8(v).reshape(-1, r * cin)
        acc = jnp.dot(a, wk, preferred_element_type=jnp.int32)
        acc = acc.reshape(-1, cout) + bias
        return apply_requant(acc, RP).reshape(b, h, w, cout)

    mb = (b * h * w * (cin + cout)) / 1e6
    print(f"\n[{b}x{h}x{w}x{cin} -> {cout}]  ({mb:.0f} MB moved, "
          f"roofline ~{mb/819:.3f} ms)")
    for name, fn in (("dot", f_dot), ("dotg", f_dotg), ("conv", f_conv),
                     ("packed", f_packed)):
        try:
            dt = timeit(fn, x)
            print(f"  {name:7s} {dt*1e3:8.3f} ms   {mb/1e3/dt:6.0f} GB/s")
        except Exception as e:
            print(f"  {name:7s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    run_case(128, 112, 112, 32, 16)    # block0_0_project: 3.85 ms today
    run_case(128, 112, 112, 16, 96)    # block1_0_expand:  2.16 ms today
    run_case(128, 56, 56, 144, 24)     # block1_1_project: 1.10 ms today
    run_case(128, 14, 14, 384, 96)     # mid-size control
