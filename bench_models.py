#!/usr/bin/env python
"""Model-table benchmark sweep: the bench/convolution.cc analogue.

Runs every zoo model end-to-end on the current device (batch 1 and a
throughput batch) and prints one row per model plus a JSON summary written
to BENCH_MODELS.json.  bench.py remains the single-line headline driver;
this is the wide sweep mirroring the reference's 16-model benchmark table
(bench/convolution.cc:944-962).

Usage: python bench_models.py [--iters 30] [--batch 64] [--models a,b,c]
"""

import argparse
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qnnpack_tpu.models import (bert_encoder_forward, build_bert_encoder,  # noqa: E402
                                build_mobilenet_v2, enet_seg, graph_forward,
                                mobilenet_v1, mobilenet_v2_forward, resnet18,
                                resnet50, shufflenet_v1, shufflenet_v2,
                                squeezenet_v10, squeezenet_v11, vgg16)
from qnnpack_tpu.models.bert import BertConfig  # noqa: E402
from qnnpack_tpu.utils.timing import measure_loop  # noqa: E402


def measured_capability():
    """Same-day delivered peaks (the chip drifts; see BENCH_NOTES.md)."""
    rng = np.random.default_rng(3)
    d = 4096
    ai = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)
    wi = jnp.asarray(rng.integers(0, 256, (d, d), dtype=np.int64) - 128,
                     jnp.int8)

    def int8_dot(v):
        acc = jnp.matmul(v, wi, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    m = measure_loop(int8_dot, ai, chain=True, est_seconds=1e-3,
                     min_seconds=0.2, repeats=3)
    tops = 2.0 * d**3 / m.seconds / 1e12
    x = jnp.asarray(rng.integers(0, 256, (128 * 1024 * 1024,),
                                 dtype=np.int64).astype(np.uint8))
    m2 = measure_loop(lambda v: v + jnp.uint8(1), x, chain=True,
                      est_seconds=5e-4, min_seconds=0.2, repeats=3)
    gbps = 2.0 * x.size / m2.seconds / 1e9
    return tops, gbps


def _graph_model(builder, input_size, **kw):
    def make():
        rng = np.random.default_rng(0)
        params, spec = builder(rng, **kw)
        fwd = lambda p, v: graph_forward(p, spec, v)  # noqa: E731
        return params, fwd, (input_size, input_size, 3), spec
    return make


def _mobilenet_v2():
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=224, requant="fp32")
    return (params, lambda p, v: mobilenet_v2_forward(p, spec, v),
            (224, 224, 3), spec)


def _bert_base(seq=128):
    rng = np.random.default_rng(0)
    cfg = BertConfig(layers=12, hidden=768, heads=12, ffn=3072, seq_len=seq)
    params, spec = build_bert_encoder(rng, cfg)
    return (params, lambda p, v: bert_encoder_forward(p, spec, v),
            (seq, 768), None)  # token-graph spec: no conv cost model


# Per-iteration time hints (seconds per sample at batch 1), used to size the
# measurement loop without a calibration pass: for the big token models the
# calibration would build a 256-iteration scan over a ~0.2 s b128 body,
# which is what faulted the round-3 BERT row (scan of 256 x 221 ms = a
# 56 s device program).  A 2x-off hint only moves n one power of two.
EST_PER_SAMPLE_S = {"bert_base_s128": 1.6e-3}


def _roofline_ms(spec, batch, in_shape, tops, gbps):
    """Analytic best-case forward time against the MEASURED same-day peaks:
    max(compute, bandwidth) bound over the summed graph cost
    (bench/q8gemm.cc:108 GOPS-accounting analogue).  Also returns which
    bound binds, so the sweep can state per model whether it is compute- or
    bandwidth-limited."""
    if spec is None or not hasattr(spec, "raw_weights"):
        return None, None
    from qnnpack_tpu.utils.profiling import total_cost
    cost = total_cost(spec, (batch,) + in_shape)
    t_compute = cost.flops / (tops * 1e12)
    t_memory = cost.bytes_accessed / (gbps * 1e9)
    bound = "compute" if t_compute >= t_memory else "bandwidth"
    return max(t_compute, t_memory) * 1e3, bound


# The full reference benchmark table (bench/convolution.cc:944-962
# registers 16 model configs) plus the segmentation and BERT stretch
# configs.  `--models` selects subsets; the committed BENCH_MODELS.json
# carries every row.
MODELS = {
    "mobilenet_v1": _graph_model(mobilenet_v1, 224),
    "mobilenet_v2": _mobilenet_v2,
    "shufflenet_v1_g1": _graph_model(shufflenet_v1, 224, groups=1),
    "shufflenet_v1_g2": _graph_model(shufflenet_v1, 224, groups=2),
    "shufflenet_v1_g3": _graph_model(shufflenet_v1, 224, groups=3),
    "shufflenet_v1_g4": _graph_model(shufflenet_v1, 224, groups=4),
    "shufflenet_v1_g8": _graph_model(shufflenet_v1, 224, groups=8),
    "shufflenet_v2_x05": _graph_model(shufflenet_v2, 224, width=0.5),
    "shufflenet_v2_x1": _graph_model(shufflenet_v2, 224, width=1.0),
    "shufflenet_v2_x15": _graph_model(shufflenet_v2, 224, width=1.5),
    "shufflenet_v2_x2": _graph_model(shufflenet_v2, 224, width=2.0),
    "squeezenet_v10": _graph_model(squeezenet_v10, 224),
    "squeezenet_v11": _graph_model(squeezenet_v11, 224),
    "resnet18": _graph_model(resnet18, 224),
    "resnet50": _graph_model(resnet50, 224),
    "vgg16": _graph_model(vgg16, 224),
    "enet_seg": _graph_model(enet_seg, 256),
    "bert_base_s128": _bert_base,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--models", type=str, default=None,
                    help="comma-separated subset")
    ap.add_argument("--update", action="store_true",
                    help="merge the measured rows into the existing "
                         "BENCH_MODELS.json instead of overwriting it "
                         "(re-measured rows get their own same-session "
                         "cap_* fields; notes are preserved)")
    args = ap.parse_args()

    names = (args.models.split(",") if args.models else list(MODELS))
    tops, gbps = measured_capability()
    print(f"capability: int8 {tops:.1f} TOPS, HBM {gbps:.0f} GB/s",
          flush=True)
    rng = np.random.default_rng(1)
    rows = {}
    for name in names:
        make = MODELS[name]
        params, fwd, in_shape, spec = make()
        row = {}
        for batch in (1, args.batch):
            x = jnp.asarray(rng.integers(
                0, 256, (batch,) + in_shape, dtype=np.int64).astype(np.uint8))
            est = EST_PER_SAMPLE_S.get(name)
            try:
                meas = measure_loop(
                    lambda v: fwd(params, v), x,
                    est_seconds=None if est is None else est * batch)
            except Exception as exc:  # noqa: BLE001 - record and continue
                row[f"b{batch}"] = f"error: {type(exc).__name__}: {exc}"[:120]
                continue
            dt = meas.seconds
            row[f"b{batch}_ms"] = round(dt * 1e3, 3)
            row[f"b{batch}_ips"] = round(batch / dt, 1)
            row[f"b{batch}_disp"] = round(meas.dispersion, 3)
            rf, bound = _roofline_ms(spec, batch, in_shape, tops, gbps)
            if rf is not None:
                row[f"b{batch}_roofline_pct"] = round(100 * rf / (dt * 1e3), 1)
                row[f"b{batch}_bound"] = bound
        rows[name] = row
        b1 = row.get("b1_ms", "-")
        bn = row.get(f"b{args.batch}_ips", "-")
        rfp = row.get(f"b{args.batch}_roofline_pct", "-")
        bnd = row.get(f"b{args.batch}_bound", "-")
        print(f"{name:24s} b1 {b1} ms   b{args.batch} {bn} img/s   "
              f"roofline {rfp}% ({bnd}-bound)", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_MODELS.json")
    if args.update and os.path.exists(out):
        with open(out) as f:
            doc = json.load(f)
        for name, row in rows.items():
            # Re-measured rows carry their own same-session capability so
            # their roofline %s stay tied to the probe they used.
            row["cap_int8_tops"] = round(tops, 1)
            row["cap_hbm_gbps"] = round(gbps, 0)
            doc["models"][name] = row
        doc["date"] = "2026-08-21"
    else:
        doc = {"device": jax.devices()[0].device_kind,
               "date": "2026-08-21",
               "cap_int8_tops": round(tops, 1),
               "cap_hbm_gbps": round(gbps, 0),
               "batch": args.batch, "models": rows}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "model_sweep", "models": len(rows),
                      "file": out}))


if __name__ == "__main__":
    main()
