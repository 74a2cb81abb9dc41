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
import time

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
                                squeezenet_v11, vgg16)
from qnnpack_tpu.models.bert import BertConfig  # noqa: E402


def time_loop(fn, x, iters):
    """Slope-based marginal device time per call (see bench.py)."""
    def make(n):
        @jax.jit
        def loop(x0):
            def body(i, s):
                v = x0 ^ (i & 3).astype(jnp.uint8)
                y = fn(v)
                return s + jnp.sum(y, dtype=jnp.int32)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    n1, n2 = max(iters // 5, 1), iters
    t = {}
    for n in (n1, n2):
        loop = make(n)
        loop(x).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


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


def _roofline_ms(spec, batch, in_shape):
    """Analytic best-case forward time: max(compute, bandwidth) bound over
    the summed graph cost (bench/q8gemm.cc:108 GOPS-accounting analogue)."""
    if spec is None or not hasattr(spec, "raw_weights"):
        return None
    from qnnpack_tpu.config import tune_params
    from qnnpack_tpu.utils.profiling import total_cost
    tp = tune_params()
    if tp.int8_peak_tops <= 0 or tp.hbm_gbps <= 0:
        return None
    cost = total_cost(spec, (batch,) + in_shape)
    t_compute = cost.flops / (tp.int8_peak_tops * 1e12)
    t_memory = cost.bytes_accessed / (tp.hbm_gbps * 1e9)
    return max(t_compute, t_memory) * 1e3


MODELS = {
    "mobilenet_v1": _graph_model(mobilenet_v1, 224),
    "mobilenet_v2": _mobilenet_v2,
    "shufflenet_v1_g3": _graph_model(shufflenet_v1, 224, groups=3),
    "shufflenet_v2_x1": _graph_model(shufflenet_v2, 224, width=1.0),
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
    args = ap.parse_args()

    names = (args.models.split(",") if args.models else list(MODELS))
    rng = np.random.default_rng(1)
    rows = {}
    for name in names:
        make = MODELS[name]
        params, fwd, in_shape, spec = make()
        row = {}
        for batch, iters in ((1, args.iters), (args.batch, max(args.iters // 4, 3))):
            x = jnp.asarray(rng.integers(
                0, 256, (batch,) + in_shape, dtype=np.int64).astype(np.uint8))
            try:
                dt = time_loop(lambda v: fwd(params, v), x, iters)
            except Exception as exc:  # noqa: BLE001 - record and continue
                row[f"b{batch}"] = f"error: {type(exc).__name__}"
                continue
            row[f"b{batch}_ms"] = round(dt * 1e3, 3)
            row[f"b{batch}_ips"] = round(batch / dt, 1)
            rf = _roofline_ms(spec, batch, in_shape)
            if rf is not None:
                row[f"b{batch}_roofline_pct"] = round(100 * rf / (dt * 1e3), 1)
        rows[name] = row
        b1 = row.get("b1_ms", "-")
        bn = row.get(f"b{args.batch}_ips", "-")
        rfp = row.get(f"b{args.batch}_roofline_pct", "-")
        print(f"{name:24s} b1 {b1} ms   b{args.batch} {bn} img/s   "
              f"roofline {rfp}%", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_MODELS.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "batch": args.batch, "models": rows}, f, indent=1)
    print(json.dumps({"metric": "model_sweep", "models": len(rows),
                      "file": out}))


if __name__ == "__main__":
    main()
