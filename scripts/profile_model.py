#!/usr/bin/env python
"""Per-layer cost breakdown of any zoo GraphSpec model at batch B.

Generalizes scripts/profile_b128.py (MobileNetV2-only) to the whole model
table: walks the GraphSpec like graph_forward does, times each UNIQUE
(kind, shape) layer combination in isolation with the two-point scan
harness (utils/timing.measure_loop), weights by occurrence count, and
reconciles the weighted sum against the same-day end-to-end forward.
VERDICT r4 next-round #1(b): the reference registers per-layer operator
benchmarks for every model table (bench/convolution.cc:108-962); this is
that capability for ours.

Usage: python scripts/profile_model.py resnet18 [--batch 128]
Writes PROFILE_<MODEL>_B<batch>.md.
"""
import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.models import (enet_seg, graph_forward, mobilenet_v1,  # noqa: E402
                                resnet18, resnet50, shufflenet_v1,
                                shufflenet_v2, squeezenet_v10, squeezenet_v11,
                                vgg16)
from qnnpack_tpu.models.graph import GraphSpec  # noqa: E402
from qnnpack_tpu.nn.conv import q8conv2d, q8deconv2d  # noqa: E402
from qnnpack_tpu.nn.elementwise import u8softargmax, x8zip  # noqa: E402
from qnnpack_tpu.nn.gemm import q8gemm  # noqa: E402
from qnnpack_tpu.nn.pool import (q8avgpool2d, q8gavgpool,  # noqa: E402
                                 u8maxpool2d)
from qnnpack_tpu.quant.requantize import add_quantize  # noqa: E402
from qnnpack_tpu.utils.profiling import graph_cost  # noqa: E402
from qnnpack_tpu.utils.timing import measure_loop  # noqa: E402

MODELS = {
    "mobilenet_v1": lambda rng: mobilenet_v1(rng),
    "shufflenet_v1_g1": lambda rng: shufflenet_v1(rng, groups=1),
    "shufflenet_v1_g2": lambda rng: shufflenet_v1(rng, groups=2),
    "shufflenet_v1_g3": lambda rng: shufflenet_v1(rng, groups=3),
    "shufflenet_v1_g4": lambda rng: shufflenet_v1(rng, groups=4),
    "shufflenet_v1_g8": lambda rng: shufflenet_v1(rng, groups=8),
    "shufflenet_v2_x05": lambda rng: shufflenet_v2(rng, width=0.5),
    "shufflenet_v2_x1": lambda rng: shufflenet_v2(rng, width=1.0),
    "shufflenet_v2_x15": lambda rng: shufflenet_v2(rng, width=1.5),
    "shufflenet_v2_x2": lambda rng: shufflenet_v2(rng, width=2.0),
    "squeezenet_v10": lambda rng: squeezenet_v10(rng),
    "squeezenet_v11": lambda rng: squeezenet_v11(rng),
    "resnet18": lambda rng: resnet18(rng),
    "resnet50": lambda rng: resnet50(rng),
    "vgg16": lambda rng: vgg16(rng),
    "enet_seg": lambda rng: enet_seg(rng),
}
INPUT_SIZE = {"enet_seg": 256}


def capability():
    """Same-day delivered int8 peak + HBM rate (BENCH_NOTES.md)."""
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
    int8_ops = 2.0 * d**3 / mcap.seconds
    xh = jnp.asarray(rngc.integers(0, 256, (128 * 1024 * 1024,),
                                   dtype=np.int64).astype(np.uint8))
    mh = measure_loop(lambda v: v + jnp.uint8(1), xh, chain=True,
                      est_seconds=5e-4, min_seconds=0.2, repeats=3)
    hbm_bps = 2.0 * xh.size / mh.seconds
    return int8_ops, hbm_bps


def walk(spec: GraphSpec, params, in_shape):
    """Yield (kind, name, fn, input_shapes) for every cost-bearing layer,
    tracking activation/slot shapes exactly as graph_forward does."""
    shape = in_shape
    env = {}
    for (tag, name, payload), p in zip(spec.layers, params):
        if tag == "save":
            env[payload] = shape
            continue
        if tag == "load":
            shape = env[payload]
            continue
        if tag == "split":
            slot, ch = payload
            env[slot] = shape[:-1] + (ch,)
            shape = shape[:-1] + (shape[-1] - ch,)
            continue
        if tag == "flatten":
            shape = (shape[0], int(np.prod(shape[1:])))
            continue
        if tag == "add":
            slot, qp = payload
            fn = lambda vs, qp=qp: add_quantize(vs[0], vs[1], qp)  # noqa: E731
            ins = (shape, env[slot])
            extra = ()
        elif tag == "concat":
            fn = lambda vs: jnp.concatenate(list(vs), axis=-1)  # noqa: E731
            ins = tuple(env[s] for s in payload)
            shape = ins[0][:-1] + (sum(s[-1] for s in ins),)
            extra = ()
        elif tag == "shuffle":
            fn = lambda v, g_=payload: x8zip(v, g_)  # noqa: E731
            ins = (shape,)
            extra = (payload,)
        elif tag == "maxpool":
            pool, strides, padding = payload
            fn = lambda v, a=pool, s=strides, pd=padding: \
                u8maxpool2d(v, a, s, pd)  # noqa: E731
            ins = (shape,)
            extra = (pool, strides, padding)
        elif tag == "avgpool":
            qp, pool, strides, padding = payload
            fn = lambda v, q=qp, a=pool, s=strides, pd=padding: \
                q8avgpool2d(v, q, a, s, pd)  # noqa: E731
            ins = (shape,)
            extra = (pool, strides, padding)
        elif tag == "gap":
            def fn(v, qp=payload):
                b, h, w, c = v.shape
                return q8gavgpool(v.reshape(b, h * w, c), qp, axis=1)
            ins = (shape,)
            extra = ()
        elif tag == "gemm":
            fn = lambda v, p=p, rp=payload.rparams: q8gemm(v, p, rp)  # noqa: E731
            ins = (shape,)
            extra = (p.k, p.n)
        elif tag == "conv":
            fn = lambda v, p=p, cs=payload: q8conv2d(
                v, p, cs.rparams, cs.strides, cs.padding)  # noqa: E731
            ins = (shape,)
            extra = (tuple(np.shape(p.w)), p.groups, payload.strides,
                     payload.padding)
        elif tag == "deconv":
            cs, adjustment = payload
            fn = lambda v, p=p, cs=cs, adj=adjustment: q8deconv2d(
                v, p, cs.rparams, cs.strides, cs.padding, adj)  # noqa: E731
            ins = (shape,)
            extra = (tuple(np.shape(p.w)), p.groups, cs.strides, cs.padding,
                     adjustment)
        elif tag == "softargmax":
            fn = lambda v, t=payload: u8softargmax(v, t)  # noqa: E731
            ins = (shape,)
            extra = ()
        else:
            raise ValueError(f"unhandled tag {tag!r}")
        if tag not in ("add", "concat"):
            out = jax.eval_shape(
                fn, jax.ShapeDtypeStruct(ins[0], jnp.uint8))
            shape = tuple(out.shape)
        yield tag, name, fn, ins, extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=sorted(MODELS))
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    batch = args.batch

    rng = np.random.default_rng(0)
    params, spec = MODELS[args.model](rng)
    size = INPUT_SIZE.get(args.model, 224)
    in_shape = (batch, size, size, 3)

    int8_ops, hbm_bps = capability()
    print(f"capability: int8 {int8_ops/1e12:.0f} TOPS, "
          f"HBM {hbm_bps/1e9:.0f} GB/s", flush=True)

    # Analytic per-layer costs, aligned with the walk (same order of
    # cost-bearing layers).
    costs = graph_cost(spec, in_shape)
    cost_by_name = {}
    for oc in costs:
        cost_by_name.setdefault(oc.name, oc)

    combos = {}  # key -> [fn, in_shapes, count, name, flops, bytes]
    for tag, name, fn, ins, extra in walk(spec, params, in_shape):
        oc = cost_by_name.get(name)
        flops = oc.flops if oc else 0
        nbytes = oc.bytes_accessed if oc else 0
        key = (tag, ins, extra)
        if key in combos:
            combos[key][2] += 1
        else:
            combos[key] = [fn, ins, 1, name, flops, nbytes]

    rngd = np.random.default_rng(7)
    rows = []
    for key, (fn, ins, count, name, flops, nbytes) in combos.items():
        xi = tuple(jnp.asarray(rngd.integers(0, 256, s, dtype=np.int64)
                               .astype(np.uint8)) for s in ins)
        arg = xi if len(xi) > 1 or key[0] in ("add", "concat") else xi[0]
        roof = max(flops / int8_ops, nbytes / hbm_bps)
        try:
            dt = measure_loop(fn, arg, min_seconds=0.15, repeats=3,
                              est_seconds=max(roof, 2e-6) / 0.2).seconds
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: measurement failed: {exc}")
            continue
        bound = ("MXU" if flops / int8_ops > nbytes / hbm_bps else "HBM")
        rows.append((key[0], name, ins[0], count, dt, dt * count, roof,
                     bound))
        print(f"  {name} ({key[0]}) x{count}: {dt*1e3:.3f} ms "
              f"({100*roof/dt:.0f}% of {bound} roofline)", flush=True)

    total = sum(r[5] for r in rows)
    total_roof = sum(r[6] * r[3] for r in rows)
    rows.sort(key=lambda r: -r[5])

    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, in_shape, dtype=np.int64).astype(np.uint8))
    me2e = measure_loop(lambda v: graph_forward(params, spec, v), x,
                        min_seconds=0.2, repeats=3)
    e2e = me2e.seconds

    lines = [f"# b{batch} {args.model} per-layer cost breakdown", ""]
    lines.append(f"Measured on `{jax.devices()[0].device_kind}` with the "
                 "two-point t(2n)-t(n) scan harness (utils/timing"
                 ".measure_loop, BENCH_NOTES.md harness fix #3).  Same-day "
                 f"capability probes: int8 {int8_ops/1e12:.0f} TOPS, HBM "
                 f"{hbm_bps/1e9:.0f} GB/s.")
    lines.append("")
    lines.append(f"**Reconciliation**: end-to-end b{batch} forward (same "
                 f"harness, same day) = **{e2e*1e3:.2f} ms** (dispersion "
                 f"{me2e.dispersion:.3f}); weighted unique-layer sum = "
                 f"**{total*1e3:.2f} ms** ({100*total/e2e:.0f}% of e2e - "
                 "isolated layers omit XLA's cross-layer fusion, so the "
                 "sum normally sits above e2e).  Summed per-layer roofline "
                 f"at same-day capability: {total_roof*1e3:.2f} ms -> the "
                 f"e2e batch attains **{100*total_roof/e2e:.0f}% of the "
                 "summed per-layer roofline**.")
    lines.append("")
    lines.append("| kind | example | in_shape | x | ms_each | ms_total | % "
                 "| roofline_ms | % of roof | bound |")
    lines.append("|---|---|---|---|---|---|---|---|---|---|")
    agg, agg_roof = {}, {}
    for kind, name, ishape, count, dt, wdt, roof, bound in rows:
        lines.append(f"| {kind} | {name} | {ishape} | {count} "
                     f"| {dt*1e3:.3f} | {wdt*1e3:.3f} | {100*wdt/total:.1f} "
                     f"| {roof*1e3:.3f} | {100*roof/dt:.0f} | {bound} |")
        agg[kind] = agg.get(kind, 0.0) + wdt
        agg_roof[kind] = agg_roof.get(kind, 0.0) + roof * count
    lines += ["", "## By kind", "", "| kind | ms | % of total | % of "
              "roofline |", "|---|---|---|---|"]
    for kind, dt in sorted(agg.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {kind} | {dt*1e3:.2f} | {100*dt/total:.1f} "
                     f"| {100*agg_roof[kind]/dt:.0f} |")
    report = "\n".join(lines) + "\n"
    print("\n" + report)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"PROFILE_{args.model}_b{batch}.md")
    with open(out, "w") as f:
        f.write(report)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
