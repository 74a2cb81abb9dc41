#!/usr/bin/env python
"""Measure every unrouted Pallas kernel against its XLA path on-chip.

VERDICT r1 #8: each kernel in kernels/ must either be dispatched by a
measured rule or carry a dated measurement justifying bench-only status.
This script produces those measurements at representative model shapes
(MobileNet/ResNet layer geometry, bench/convolution.cc analogues).
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.quant.params import (compute_add_quant_params,
                                      compute_avgpool_quant_params,
                                      compute_u8_clamping_params,
                                      compute_fp32_params)
from qnnpack_tpu.quant.requantize import add_quantize, u8clamp
from qnnpack_tpu.nn.pool import u8maxpool2d, q8avgpool2d, q8gavgpool
from qnnpack_tpu.nn.conv import pack_conv_weights, q8conv2d
from qnnpack_tpu.kernels.pool import (u8maxpool_pallas, q8avgpool_pallas,
                                      q8gavgpool_pallas)
from qnnpack_tpu.kernels.vpu_ops import q8vadd_pallas, u8clamp_pallas
from qnnpack_tpu.kernels.q8conv import q8conv_pallas


def time_loop(fn, args, iters=60):
    def make(n):
        @jax.jit
        def loop(a0):
            def body(i, s):
                v = jax.tree.map(lambda t: t ^ (i & 3).astype(jnp.uint8), a0)
                y = fn(*v) if isinstance(v, tuple) else fn(v)
                return s + jnp.sum(y, dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop
    n1, n2 = max(iters // 4, 1), iters
    t = {}
    for n in (n1, n2):
        loop = make(n)
        loop(args).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            loop(args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


def gbps(nbytes, dt):
    return round(nbytes / dt / 1e9, 1)


def main():
    rng = np.random.default_rng(7)
    u8 = lambda *s: jnp.asarray(rng.integers(0, 256, s, dtype=np.int64).astype(np.uint8))
    out = {}

    # --- q8vadd: MobileNet residual-add shapes ---------------------------
    ap = compute_add_quant_params(121, 127, 113, 0.5, 0.6, 0.55, 0, 255)
    for shape in [(1, 56, 56, 24), (32, 28, 28, 32), (128, 14, 14, 96)]:
        a, b = u8(*shape), u8(*shape)
        nbytes = 3 * a.size
        d_x = time_loop(lambda x, y: add_quantize(x, y, ap), (a, b))
        d_p = time_loop(lambda x, y: q8vadd_pallas(x, y, ap), (a, b))
        out[f"vadd_{'x'.join(map(str, shape))}"] = {
            "xla_gbps": gbps(nbytes, d_x), "pallas_gbps": gbps(nbytes, d_p)}

    # --- u8clamp ---------------------------------------------------------
    cp = compute_u8_clamping_params(10, 240)
    for shape in [(128, 28, 28, 96), (1, 112, 112, 32)]:
        x = u8(*shape)
        d_x = time_loop(lambda v: u8clamp(v, cp), x)
        d_p = time_loop(lambda v: u8clamp_pallas(v, cp), x)
        out[f"clamp_{'x'.join(map(str, shape))}"] = {
            "xla_gbps": gbps(2 * x.size, d_x), "pallas_gbps": gbps(2 * x.size, d_p)}

    # --- maxpool 3x3 s2 (ResNet stem / shufflenet) ------------------------
    for shape, bsz in [((1, 112, 112, 64), 1), ((64, 112, 112, 64), 64),
                       ((64, 56, 56, 24), 64)]:
        x = u8(*shape)
        d_x = time_loop(lambda v: u8maxpool2d(v, (3, 3), (2, 2)), x, iters=30)
        d_p = time_loop(lambda v: u8maxpool_pallas(v, (3, 3), (2, 2)), x, iters=30)
        out[f"maxpool3x3s2_{'x'.join(map(str, shape))}"] = {
            "xla_gbps": gbps(x.size, d_x), "pallas_gbps": gbps(x.size, d_p)}

    # --- avgpool 7x7 (squeezenet-style) -----------------------------------
    pp = compute_avgpool_quant_params(-121 * 49, 1.0 / 49, 120, input_zero_point=121)
    for shape in [(64, 28, 28, 96)]:
        x = u8(*shape)
        d_x = time_loop(lambda v: q8avgpool2d(v, pp, (7, 7), (7, 7)), x, iters=30)
        d_p = time_loop(lambda v: q8avgpool_pallas(v, pp, (7, 7), (7, 7)), x, iters=30)
        out[f"avgpool7x7_{'x'.join(map(str, shape))}"] = {
            "xla_gbps": gbps(x.size, d_x), "pallas_gbps": gbps(x.size, d_p)}

    # --- global avgpool (MobileNet head) ----------------------------------
    pg = compute_avgpool_quant_params(-121 * 49, 1.0 / 49, 120, input_zero_point=121)
    for shape in [(128, 49, 1280), (1, 49, 1280)]:
        x = u8(*shape)
        d_x = time_loop(lambda v: q8gavgpool(v, pg), x)
        d_p = time_loop(lambda v: q8gavgpool_pallas(v, pg), x)
        out[f"gavgpool_{'x'.join(map(str, shape))}"] = {
            "xla_gbps": gbps(x.size, d_x), "pallas_gbps": gbps(x.size, d_p)}

    # --- q8conv 3x3: ResNet body / MobileNet stem shapes -------------------
    rp = compute_fp32_params(0.003, 128)
    for (shape, co, k, s) in [((1, 224, 224, 3), 32, 3, 2),
                              ((8, 56, 56, 64), 64, 3, 1),
                              ((32, 14, 14, 160), 160, 3, 1)]:
        x = u8(*shape)
        kern = rng.integers(0, 256, (co, k, k, shape[-1]), dtype=np.int64).astype(np.uint8)
        packed = pack_conv_weights(kern, None, 121, 103)
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        flops = 2 * shape[0] * (shape[1] // s) * (shape[2] // s) * co * k * k * shape[-1]
        d_x = time_loop(lambda v: q8conv2d(v, packed, rp, (s, s), pad), x, iters=30)
        try:
            d_p = time_loop(lambda v: q8conv_pallas(v, packed, rp, strides=(s, s),
                                                    padding=pad), x, iters=30)
            pg_ = round(flops / d_p / 1e9, 1)
        except Exception as e:  # noqa: BLE001
            pg_ = f"err: {str(e)[:60]}"
        out[f"conv{k}x{k}s{s}_{'x'.join(map(str, shape))}_o{co}"] = {
            "xla_gops": round(flops / d_x / 1e9, 1), "pallas_gops": pg_}

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
