#!/usr/bin/env python
"""Split-GEMM grouped-1x1 lowering: the unmeasured g4/g8 28px cells.

BENCH_GROUPED_1X1.json's split_gemms rule excludes g >= 4 on the strength
of 14px cells only (g4_14px_544to136, g8_14px_768to192 tie/lose); but the
g >= 4 ShuffleNet v1 models spend their stage-0 time on 28px grouped
1x1s (272->68/68->272/68->248 for g4, 384->96/96->384/96->360 for g8 -
models/zoo.py shufflenet_v1), the exact spatial class where g2/g3 won
1.1-2.7x.  This script measures those cells conv-vs-split at b128 and, if
they win, A/Bs shufflenet_v1_g4/g8 b128 end-to-end (the round-5 law:
isolated wins must prove themselves e2e before routing ships).

Appends a `split_g48` section to BENCH_GROUPED_1X1.json.
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

from qnnpack_tpu.nn import make_requant_params, pack_conv_weights
from qnnpack_tpu.nn.conv import q8conv2d
import qnnpack_tpu.nn.conv as convmod
from qnnpack_tpu.models import graph_forward, shufflenet_v1
from qnnpack_tpu.utils.timing import measure_loop

rng = np.random.default_rng(7)
rp = make_requant_params("fp32", 0.003, 128)

# (name, h, cin, cout, groups) - the g4/g8 28px grouped-1x1 shapes from
# models/zoo.py shufflenet_v1 (stage 0: g4 stage_channels 272, g8 384).
SHAPES = [
    ("g4_28px_272to68", 28, 272, 68, 4),
    ("g4_28px_68to272", 28, 68, 272, 4),
    ("g8_28px_384to96", 28, 384, 96, 8),
    ("g8_28px_96to384", 28, 96, 384, 8),
]
B = 128

orig_gate = convmod._grouped_1x1_split


def force_gate(on: bool):
    convmod._grouped_1x1_split = (
        (lambda batch, packed, pixels: True) if on else
        (lambda batch, packed, pixels: False))


section = {"date": "2026-08-21", "device": jax.devices()[0].device_kind,
           "what": ("g4/g8 28px cells the original split_gemms sweep never "
                    "measured (its g>=4 exclusion came from 14px cells only); "
                    "same harness, bit-exact asserted per cell"),
           "isolated_rows_us": {}, "e2e_validation": {}}

for name, h, cin, cout, g in SHAPES:
    wt = rng.integers(0, 256, (cout, 1, 1, cin // g), dtype=np.int64).astype(np.uint8)
    bias = rng.integers(-5000, 5000, (cout,), dtype=np.int64).astype(np.int32)
    packed = pack_conv_weights(wt, bias, 121, 128, groups=g)
    a = jnp.asarray(rng.integers(0, 256, (B, h, h, cin), dtype=np.int64).astype(np.uint8))
    cell = {}
    outs = {}
    for label, on in (("conv", False), ("split", True)):
        force_gate(on)
        f = jax.jit(lambda v: q8conv2d(v, packed, rp))
        outs[label] = np.asarray(f(a))
        m = measure_loop(f, a, min_seconds=0.12, repeats=3, est_seconds=2e-4)
        cell[label + "_us"] = round(m.seconds * 1e6, 1)
        cell[label + "_disp"] = round(m.dispersion, 3)
        convmod._grouped_1x1_split = orig_gate
    mism = int((outs["conv"] != outs["split"]).sum())
    assert mism == 0, (name, mism)
    cell["split_over_conv"] = round(cell["conv_us"] / cell["split_us"], 2)
    section["isolated_rows_us"][name] = cell
    print(name, cell, flush=True)

# End-to-end A/B: gate max_groups 3 (off for g4/g8 -> conv path) vs 8.
for groups in (4, 8):
    spec_params = shufflenet_v1(np.random.default_rng(11), groups=groups)
    params, spec = spec_params
    x = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))
    row = {}
    outs = {}
    for label, on in (("off", False), ("on", True)):
        if on:
            convmod._grouped_1x1_split = (
                lambda batch, packed, pixels:
                    batch > 32 and packed.groups <= 8 and pixels >= 784)
        f = jax.jit(lambda v: graph_forward(params, spec, v))
        outs[label] = np.asarray(jax.tree.leaves(f(x))[0])
        m = measure_loop(f, x, min_seconds=0.2, repeats=3, est_seconds=6e-3)
        row[label + "_ms"] = round(m.seconds * 1e3, 3)
        row[label + "_disp"] = round(m.dispersion, 3)
        convmod._grouped_1x1_split = orig_gate
    mism = int((outs["off"] != outs["on"]).sum())
    assert mism == 0, ("e2e", groups, mism)
    row["speedup"] = round(row["off_ms"] / row["on_ms"], 3)
    section["e2e_validation"][f"shufflenet_v1_g{groups}_b128_ms"] = row
    print(f"e2e g{groups}", row, flush=True)

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_GROUPED_1X1.json")
with open(path) as f:
    doc = json.load(f)
doc["split_g48"] = section
with open(path, "w") as f:
    json.dump(doc, f, indent=1)
print("wrote", path)
