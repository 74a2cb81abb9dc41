#!/usr/bin/env python
"""E2e validation for extending the split-GEMM grouped-1x1 gate to g4.

Isolated 28px cells (scripts/bench_split_g48.py, same session): g4 272->68
split wins 1.59x, g4 68->272 wins 2.89x, g8 384->96 LOSES 0.70x (the
per-group unroll overhead at g8 outweighs the conv path's inefficiency) -
so the candidate rule is max_groups 3 -> 4, pixels >= 784 unchanged.
This script runs the round-5 law's e2e arm: shufflenet_v1_g4 b128 with
the gate off (conv path) vs g <= 4, bit-exact, fresh jit per arm.
Writes the combined split_g48 section into BENCH_GROUPED_1X1.json.

CONVENTION LESSON (committed in the artifact's convention_note and
BENCH_NOTES.md #5): weights must reach the jitted forward as a jit
ARGUMENT, the way bench_models.py and the serving layer pass them.  A
first version of this A/B closed over the weights pre-jit (compile-time
constants) and measured a 0.999 NULL - constant weights let XLA fold the
feature_group_count conv's layout and reach the split-GEMM rate on its
own (off arm 4.203 ms vs the production row's 5.993).  Re-run with
runtime weights the off arm reproduces the committed row (5.963 ms) and
the split lowering wins 1.413x.
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

import qnnpack_tpu.nn.conv as convmod
from qnnpack_tpu.models import graph_forward, shufflenet_v1
from qnnpack_tpu.utils.timing import measure_loop

rng = np.random.default_rng(7)
orig_gate = convmod._grouped_1x1_split

section = {
    "date": "2026-08-21", "device": jax.devices()[0].device_kind,
    "what": ("g4/g8 28px cells the original split_gemms sweep never "
             "measured (its g>=4 exclusion came from 14px cells only); "
             "same harness, bit-exact asserted per cell.  g8 96->384 "
             "cell not measured: the session hit a transient axon "
             "UNAVAILABLE fault there, and g8 is already excluded by "
             "the 384->96 loss."),
    "isolated_rows_us": {
        "g4_28px_272to68": {"conv_us": 144.7, "conv_disp": 0.001,
                            "split_us": 90.9, "split_disp": 0.001,
                            "split_over_conv": 1.59},
        "g4_28px_68to272": {"conv_us": 408.4, "conv_disp": 0.0,
                            "split_us": 141.1, "split_disp": 0.001,
                            "split_over_conv": 2.89},
        "g8_28px_384to96": {"conv_us": 143.2, "conv_disp": 0.0,
                            "split_us": 204.7, "split_disp": 0.0,
                            "split_over_conv": 0.7},
    },
    "rule": ("extend grouped_1x1_split_max_groups 3 -> 4 (pixels >= 784 "
             "unchanged): g4 28px wins 1.6-2.9x isolated and the e2e arm "
             "below confirms; g8 stays on the conv path (0.70x isolated "
             "at its dominant 28px cell)"),
    "e2e_validation": {},
}

params, spec = shufflenet_v1(np.random.default_rng(0), groups=4)
x = jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3),
                             dtype=np.int64).astype(np.uint8))
row = {}
outs = {}
for label, on in (("off", False), ("on", True)):
    convmod._grouped_1x1_split = (
        (lambda batch, packed, pixels:
             batch > 32 and packed.groups <= 4 and pixels >= 784) if on
        else (lambda batch, packed, pixels:
             batch > 32 and packed.groups <= 3 and pixels >= 784))
    # Weights as a jit ARGUMENT (production convention - see module doc).
    f = jax.jit(lambda p, v: graph_forward(p, spec, v))
    outs[label] = np.asarray(jax.tree.leaves(f(params, x))[0])
    m = measure_loop(lambda v: f(params, v), x, min_seconds=0.2, repeats=3,
                     est_seconds=6e-3)
    row[label + "_ms"] = round(m.seconds * 1e3, 3)
    row[label + "_disp"] = round(m.dispersion, 3)
    convmod._grouped_1x1_split = orig_gate
mism = int((outs["off"] != outs["on"]).sum())
assert mism == 0, ("e2e g4", mism)
row["speedup"] = round(row["off_ms"] / row["on_ms"], 3)
section["e2e_validation"]["shufflenet_v1_g4_b128_ms"] = row
print("e2e g4", row, flush=True)

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_GROUPED_1X1.json")
with open(path) as f:
    doc = json.load(f)
doc["split_g48"] = section
with open(path, "w") as f:
    json.dump(doc, f, indent=1)
print("wrote", path)
