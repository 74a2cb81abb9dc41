#!/usr/bin/env python
"""Per-layer cost breakdown of the b128 MobileNetV2 forward.

Times each UNIQUE (kind, shape) layer combination in isolation (slope
timing, like bench.py) and prints a sorted cost table weighted by how many
times the shape occurs, so we can see where the batch time goes.
VERDICT round-1 item #1.
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

from qnnpack_tpu.models.mobilenet_v2 import build_mobilenet_v2
from qnnpack_tpu.nn.gemm import q8gemm
from qnnpack_tpu.nn.conv import q8conv2d
from qnnpack_tpu.nn.pool import q8gavgpool
from qnnpack_tpu.quant.requantize import add_quantize

BATCH = int(os.environ.get("B", "128"))
ITERS = int(os.environ.get("ITERS", "12"))


def timeit(fn, x, iters=ITERS):
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
        for _ in range(3):
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=224, requant="fp32")
    x = jnp.asarray(rng.integers(0, 256, (BATCH, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))

    # Walk the graph, recording unique (kind, key) -> (fn, input, count).
    combos = {}  # key -> [fn, x_input, count, example_name]
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
            residual = None
        elif tag == "gap":
            def fn(v, layer=layer):
                b, h, w, c = v.shape
                return q8gavgpool(v.reshape(b, h * w, c), layer, axis=1)
            key = ("gap", xs.shape)
        elif tag == "conv" and layer.kind == "gemm":
            if xs.ndim == 4:
                def fn(v, p=p, layer=layer):
                    b, h, w, c = v.shape
                    return q8gemm(v.reshape(b * h * w, c), p,
                                  layer.rparams).reshape(b, h, w, -1)
                key = ("gemm", xs.shape, p.n)
            else:
                def fn(v, p=p, layer=layer):
                    return q8gemm(v, p, layer.rparams)
                key = ("fc", xs.shape, p.n)
        elif tag == "conv":
            fn = lambda v, p=p, layer=layer: q8conv2d(
                v, p, layer.rparams, layer.strides, layer.padding)
            kind = "dwconv" if layer.kind == "dwconv" else "conv"
            key = (kind, xs.shape, p.w.shape, layer.strides)
        xs2 = fn(xs)
        if key in combos:
            combos[key][2] += 1
        else:
            combos[key] = [fn, xs, 1, name]
        xs = xs2

    rows = []
    for key, (fn, xi, count, name) in combos.items():
        dt = timeit(fn, xi)
        rows.append((key[0], name, xi.shape, count, dt, dt * count))
        print(f"  measured {name} ({key[0]}) x{count}: {dt*1e3:.3f} ms",
              flush=True)

    total = sum(r[5] for r in rows)
    rows.sort(key=lambda r: -r[5])
    print(f"\n=== b{BATCH} unique-layer cost breakdown "
          f"(weighted sum: {total*1e3:.2f} ms) ===")
    print(f"{'kind':7s} {'example':24s} {'in_shape':24s} {'x':>3s} "
          f"{'ms_each':>8s} {'ms_total':>9s} {'%':>6s}")
    agg = {}
    for kind, name, ishape, count, dt, wdt in rows:
        print(f"{kind:7s} {name:24s} {str(ishape):24s} {count:3d} "
              f"{dt*1e3:8.3f} {wdt*1e3:9.3f} {100*wdt/total:6.1f}")
        agg[kind] = agg.get(kind, 0.0) + wdt
    print("\n--- by kind ---")
    for kind, dt in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{kind:8s} {dt*1e3:8.2f} ms  {100*dt/total:5.1f}%")


if __name__ == "__main__":
    main()
