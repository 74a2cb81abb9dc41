#!/usr/bin/env python
"""Per-layer cost breakdown of the b128 MobileNetV2 forward.

Times each UNIQUE (kind, shape) layer combination in isolation with the
fixed-N median harness (utils/timing.measure_loop; see BENCH_NOTES.md) and
prints a sorted cost table weighted by how many times the shape occurs, so
we can see where the batch time goes.  VERDICT round-1 item #1; the
committed artifact is PROFILE_B128.md.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,
                                             mobilenet_v2_forward)
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.nn.conv import q8conv2d
from qnnpack_tpu.nn.pool import q8gavgpool
from qnnpack_tpu.quant.requantize import add_quantize
from qnnpack_tpu.utils.timing import measure_loop

BATCH = int(os.environ.get("B", "128"))


def timeit(fn, x, est=None):
    # est: roofline-derived per-iteration estimate (assume ~20% attainment)
    # to skip the calibration compile pair - a 2x-off estimate only moves
    # the loop length one power of two.
    return measure_loop(fn, x, min_seconds=0.15, repeats=3,
                        est_seconds=est).seconds


def main():
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=224, requant="fp32")
    x = jnp.asarray(rng.integers(0, 256, (BATCH, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))

    # Same-day capability (see BENCH_NOTES.md): int8 dot peak + HBM rate.
    rngc = np.random.default_rng(3)
    d = 4096
    ai = jnp.asarray(rngc.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)
    wi = jnp.asarray(rngc.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)
    mcap = measure_loop(
        lambda v: (jnp.matmul(v, wi, preferred_element_type=jnp.int32)
                   >> 8).astype(jnp.int8), ai, chain=True,
        est_seconds=1e-3, min_seconds=0.2, repeats=3)
    int8_ops = 2.0 * d**3 / mcap.seconds          # int8 MACs*2 per second
    xh = jnp.asarray(rngc.integers(0, 256, (128 * 1024 * 1024,),
                                   dtype=np.int64).astype(np.uint8))
    mh = measure_loop(lambda v: v + jnp.uint8(1), xh, chain=True,
                      est_seconds=5e-4, min_seconds=0.2, repeats=3)
    hbm_bps = 2.0 * xh.size / mh.seconds
    print(f"capability: int8 {int8_ops/1e12:.0f} TOPS, "
          f"HBM {hbm_bps/1e9:.0f} GB/s", flush=True)

    # Walk the graph, recording unique (kind, key) -> (fn, input, count).
    combos = {}  # key -> [fn, x_input, count, example_name, flops, bytes]
    xs = x
    residual = None
    for (tag, name, layer), p in zip(spec.layers, params):
        if tag == "save":
            residual = xs
            continue
        if tag == "add":
            r = residual
            fn = lambda v, r=r, layer=layer: add_quantize(v, r, layer)
            key = ("add", xs.shape)
            flops, nbytes = 0, 3 * xs.size
            residual = None
        elif tag == "gap":
            def fn(v, layer=layer):
                b, h, w, c = v.shape
                return q8gavgpool(v.reshape(b, h * w, c), layer, axis=1)
            key = ("gap", xs.shape)
            flops, nbytes = 0, xs.size + xs.shape[0] * xs.shape[3]
        elif tag == "conv" and layer.kind == "gemm":
            # Natural-rank contraction, exactly as mobilenet_v2_forward
            # does it - reshaping to (BHW, C) first forces the relayout
            # copy the round-2 fix removed (nn/gemm.q8gemm_acc docstring).
            def fn(v, p=p, layer=layer):
                return q8gemm(v, p, layer.rparams)
            if xs.ndim == 4:
                key = ("gemm", xs.shape, p.n)
                m_rows = xs.size // xs.shape[-1]
            else:
                key = ("fc", xs.shape, p.n)
                m_rows = xs.shape[0]
            flops = 2 * m_rows * p.k * p.n
            nbytes = m_rows * p.k + p.k * p.n + m_rows * p.n + 4 * p.n
        elif tag == "conv":
            fn = lambda v, p=p, layer=layer: q8conv2d(
                v, p, layer.rparams, layer.strides, layer.padding)
            kind = "dwconv" if layer.kind == "dwconv" else "conv"
            key = (kind, xs.shape, p.w.shape, layer.strides)
            b = xs.shape[0]
            oh = -(-xs.shape[1] // layer.strides[0])
            ow = -(-xs.shape[2] // layer.strides[1])
            co = p.groups * p.group_output_channels
            flops = (2 * b * oh * ow * co * p.kernel_height
                     * p.kernel_width * p.group_input_channels)
            nbytes = (xs.size + b * oh * ow * co
                      + p.w.size + 4 * co)
        # Next activation: shape via eval_shape (zero device work - eager
        # per-primitive dispatch costs ~14 s each through this tunnel),
        # contents random (int kernels are data-independent in time).
        nxt = jax.eval_shape(fn, xs)
        if key in combos:
            combos[key][2] += 1
        else:
            combos[key] = [fn, xs, 1, name, flops, nbytes]
        xs = jnp.asarray(rng.integers(0, 256, nxt.shape,
                                      dtype=np.int64).astype(np.uint8))

    rows = []
    for key, (fn, xi, count, name, flops, nbytes) in combos.items():
        roof_est = max(flops / int8_ops, nbytes / hbm_bps)
        dt = timeit(fn, xi, est=max(roof_est, 2e-6) / 0.2)
        roof = max(flops / int8_ops, nbytes / hbm_bps)
        bound = ("MXU" if flops / int8_ops > nbytes / hbm_bps else "HBM")
        rows.append((key[0], name, xi.shape, count, dt, dt * count,
                     roof, bound))
        print(f"  measured {name} ({key[0]}) x{count}: {dt*1e3:.3f} ms "
              f"({100*roof/dt:.0f}% of {bound} roofline)", flush=True)

    total = sum(r[5] for r in rows)
    total_roof = sum(r[6] * r[3] for r in rows)
    rows.sort(key=lambda r: -r[5])

    # End-to-end b128 forward with the SAME harness, for reconciliation:
    # the per-layer sum must land within ~20% of this or the profile is
    # not to be trusted (the round-3 artifact failed exactly this check).
    me2e = measure_loop(lambda v: mobilenet_v2_forward(params, spec, v), x,
                        min_seconds=0.2, repeats=3)
    e2e = me2e.seconds

    lines = []
    lines.append(f"# b{BATCH} MobileNetV2 per-layer cost breakdown")
    lines.append("")
    lines.append(f"Measured on `{jax.devices()[0].device_kind}` on "
                 "2026-08-21 with the two-point t(2n)-t(n) scan harness "
                 "(utils/timing.measure_loop, BENCH_NOTES.md harness fix "
                 "#3) - NOT the retracted round-3 fixed-N method.  "
                 f"Same-day capability probes: int8 {int8_ops/1e12:.0f} "
                 f"TOPS, HBM {hbm_bps/1e9:.0f} GB/s.")
    lines.append("")
    lines.append(f"**Reconciliation**: end-to-end b{BATCH} forward "
                 f"(same harness, same day) = **{e2e*1e3:.2f} ms** "
                 f"(dispersion {me2e.dispersion:.3f}); weighted "
                 f"unique-layer sum = **{total*1e3:.2f} ms** "
                 f"({100*total/e2e:.0f}% of e2e - isolated layers omit "
                 "XLA's cross-layer fusion, so the sum may sit slightly "
                 "above e2e).  Roofline lower bound at same-day "
                 f"capability: {total_roof*1e3:.2f} ms -> the e2e batch "
                 f"attains **{100*total_roof/e2e:.0f}% of the summed "
                 "per-layer roofline**.")
    lines.append("")
    lines.append("| kind | example | in_shape | x | ms_each | ms_total "
                 "| % | roofline_ms | % of roof | bound |")
    lines.append("|---|---|---|---|---|---|---|---|---|---|")
    agg = {}
    agg_roof = {}
    for kind, name, ishape, count, dt, wdt, roof, bound in rows:
        lines.append(
            f"| {kind} | {name} | {ishape} | {count} | {dt*1e3:.3f} "
            f"| {wdt*1e3:.3f} | {100*wdt/total:.1f} | {roof*1e3:.3f} "
            f"| {100*roof/dt:.0f} | {bound} |")
        agg[kind] = agg.get(kind, 0.0) + wdt
        agg_roof[kind] = agg_roof.get(kind, 0.0) + roof * count
    lines.append("")
    lines.append("## By kind")
    lines.append("")
    lines.append("| kind | ms | % of total | % of roofline |")
    lines.append("|---|---|---|---|")
    for kind, dt in sorted(agg.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {kind} | {dt*1e3:.2f} | {100*dt/total:.1f} "
                     f"| {100*agg_roof[kind]/dt:.0f} |")
    report = "\n".join(lines) + "\n"
    print("\n" + report)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_B128.md")
    with open(out, "w") as f:
        f.write(report)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
