#!/usr/bin/env python
"""Measure every unrouted Pallas kernel against its XLA path on-chip.

VERDICT r1 #8 / r2 #5: each kernel in kernels/ must either be dispatched by
a measured rule or carry a dated measurement justifying bench-only status.
This script produces those measurements at representative model shapes
(MobileNet/ResNet layer geometry, bench/convolution.cc analogues) and
writes BENCH_KERNEL_ROUTING.json at the repo root - the committed artifact
the routing decisions (or retirement comments) cite.

Bandwidth-bound ops report GB/s against the same-day HBM capability probe;
conv reports GOPS.  Method: utils/timing.measure_loop (see BENCH_NOTES.md).
"""
import json
import os
import sys

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
from qnnpack_tpu.quant.requantize import add_quantize, clamp_u8
from qnnpack_tpu.nn.pool import u8maxpool2d, q8avgpool2d, q8gavgpool
from qnnpack_tpu.nn.conv import pack_conv_weights, q8conv2d
from qnnpack_tpu.kernels.pool import (u8maxpool_pallas, q8avgpool_pallas,
                                      q8gavgpool_pallas)
from qnnpack_tpu.kernels.vpu_ops import q8vadd_pallas, u8clamp_pallas
from qnnpack_tpu.kernels.q8conv import q8conv_pallas
from qnnpack_tpu.utils.timing import measure_loop

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_KERNEL_ROUTING.json")


def hbm_probe():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (256 * 1024 * 1024,),
                                 dtype=np.int64).astype(np.uint8))
    m = measure_loop(lambda v: v + jnp.uint8(1), x, chain=True)
    return 2.0 * x.size / m.seconds / 1e9


def main():
    rng = np.random.default_rng(7)
    u8 = lambda *s: jnp.asarray(  # noqa: E731
        rng.integers(0, 256, s, dtype=np.int64).astype(np.uint8))
    hbm = hbm_probe()
    print(f"capability: HBM {hbm:.0f} GB/s", flush=True)
    out = {"cap_hbm_gbps": round(hbm, 0), "date": "2026-08-21"}

    def row(key, nbytes_or_flops, unit, xla_fn, pallas_fn, args):
        # Loop-sizing estimate: bandwidth rows assume ~full HBM rate, conv
        # rows ~10 int8 TOPS; a 2x-off estimate only shifts N one power of 2.
        est = nbytes_or_flops / (500e9 if unit == "gbps" else 10e12)
        r = {}
        for name, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
            try:
                meas = measure_loop(fn, args, est_seconds=est)
                val = nbytes_or_flops / meas.seconds / 1e9
                r[name] = {unit: round(val, 1),
                           "disp": round(meas.dispersion, 3)}
                if unit == "gbps":
                    r[name]["pct_cap"] = round(100.0 * val / hbm, 1)
            except Exception as e:  # noqa: BLE001
                r[name] = {"err": str(e)[:80]}
        out[key] = r
        print(f"{key}: {r}", flush=True)

    # --- q8vadd: MobileNet residual-add shapes ---------------------------
    ap = compute_add_quant_params(121, 127, 113, 0.5, 0.6, 0, 255)
    for shape in [(1, 56, 56, 24), (32, 28, 28, 32), (128, 14, 14, 96)]:
        a, b = u8(*shape), u8(*shape)
        row(f"vadd_{'x'.join(map(str, shape))}", 3 * a.size, "gbps",
            lambda v: add_quantize(v[0], v[1], ap),
            lambda v: q8vadd_pallas(v[0], v[1], ap), (a, b))

    # --- u8clamp ---------------------------------------------------------
    cp = compute_u8_clamping_params(10, 240)
    for shape in [(128, 28, 28, 96), (1, 112, 112, 32)]:
        x = u8(*shape)
        row(f"clamp_{'x'.join(map(str, shape))}", 2 * x.size, "gbps",
            lambda v: clamp_u8(v, cp), lambda v: u8clamp_pallas(v, cp), x)

    # --- maxpool 3x3 s2 (ResNet stem / shufflenet) ------------------------
    for shape in [(1, 112, 112, 64), (64, 112, 112, 64), (64, 56, 56, 24)]:
        x = u8(*shape)
        row(f"maxpool3x3s2_{'x'.join(map(str, shape))}", int(1.25 * x.size),
            "gbps", lambda v: u8maxpool2d(v, (3, 3), (2, 2)),
            lambda v: u8maxpool_pallas(v, (3, 3), (2, 2)), x)

    # --- avgpool 7x7 (squeezenet-style) -----------------------------------
    pp = compute_avgpool_quant_params(-121 * 49, 1.0 / 49, 120,
                                      input_zero_point=121)
    for shape in [(64, 28, 28, 96)]:
        x = u8(*shape)
        row(f"avgpool7x7_{'x'.join(map(str, shape))}", x.size, "gbps",
            lambda v: q8avgpool2d(v, pp, (7, 7), (7, 7)),
            lambda v: q8avgpool_pallas(v, pp, (7, 7), (7, 7)), x)

    # --- global avgpool (MobileNet head) ----------------------------------
    pg = compute_avgpool_quant_params(-121 * 49, 1.0 / 49, 120,
                                      input_zero_point=121)
    for shape in [(128, 49, 1280), (1, 49, 1280)]:
        x = u8(*shape)
        row(f"gavgpool_{'x'.join(map(str, shape))}", x.size, "gbps",
            lambda v: q8gavgpool(v, pg), lambda v: q8gavgpool_pallas(v, pg), x)

    # --- q8conv 3x3: ResNet body / MobileNet stem shapes -------------------
    rp = compute_fp32_params(0.003, 128)
    for (shape, co, k, s) in [((1, 224, 224, 3), 32, 3, 2),
                              ((8, 56, 56, 64), 64, 3, 1),
                              ((32, 14, 14, 160), 160, 3, 1)]:
        x = u8(*shape)
        kern = rng.integers(0, 256, (co, k, k, shape[-1]),
                            dtype=np.int64).astype(np.uint8)
        packed = pack_conv_weights(kern, None, 121, 103)
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        flops = 2 * shape[0] * (shape[1] // s) * (shape[2] // s) \
            * co * k * k * shape[-1]
        row(f"conv{k}x{k}s{s}_{'x'.join(map(str, shape))}_o{co}", flops,
            "gops",
            lambda v: q8conv2d(v, packed, rp, (s, s), pad),
            lambda v: q8conv_pallas(v, packed, rp, strides=(s, s),
                                    padding=pad), x)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
