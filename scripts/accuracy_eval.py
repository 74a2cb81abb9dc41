#!/usr/bin/env python
"""Top-1 evaluation: ours vs the TFLite interpreter vs float-model labels.

VERDICT r2 #8 / BASELINE.md "top-1 delta" row.  No network access means no
real labeled image set; the principled substitute is a fixed deterministic
image set (io.accuracy.synth_images) labeled by the FLOAT model's argmax -
both quantized implementations are then scored against the same labels,
which isolates exactly the quantization-induced top-1 loss each one has,
plus their mutual top-1 agreement.  Writes ACCURACY.json at the repo root.

Needs TensorFlow (labels + interpreter reference).  Runs on CPU: the whole
pipeline is integer except the fp32 requant multiply, whose IEEE ops are
backend-independent.

Usage: python scripts/accuracy_eval.py [n_images]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ACCURACY.json")

MODELS = {
    "mobilenet_v2": ("mobilenet_v2_int8.tflite", "make_tflite_model"),
    "squeezenet_v11": ("squeezenet_v11_int8.tflite", "make_squeezenet_tflite"),
}


def eval_model(tf, asset_path, builder_module, images):
    import importlib

    import jax
    import jax.numpy as jnp

    from qnnpack_tpu.io.accuracy import (diff_stats, element_agreement,
                                         margin_stats, quantize_input,
                                         top1_accuracy, top1_agreement)
    from qnnpack_tpu.io.tflite_import import import_tflite
    from qnnpack_tpu.models.graph import graph_forward

    # Float labels (the deterministic seeded model that produced the asset).
    model, _ = importlib.import_module(builder_module).build_float_model(tf)
    labels = model.predict(images, batch_size=16,
                           verbose=0).argmax(-1).astype(np.int32)

    # TFLite interpreter reference.
    interp = tf.lite.Interpreter(model_path=asset_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    scale, zp = inp["quantization"]
    x_i8 = quantize_input(images, float(scale), int(zp))
    ref = []
    for i in range(x_i8.shape[0]):
        interp.set_tensor(inp["index"], x_i8[i:i + 1])
        interp.invoke()
        ref.append(interp.get_tensor(out["index"])[0])
    ref_u8 = (np.stack(ref).astype(np.int16) + 128).astype(np.uint8)

    # Ours.
    params, spec, meta = import_tflite(asset_path)
    fwd = jax.jit(lambda p, v: graph_forward(p, spec, v))
    x_u8 = (x_i8.astype(np.int16) + 128).astype(np.uint8)
    ours = np.asarray(fwd(params, jnp.asarray(x_u8)))

    return {
        "n_images": int(x_i8.shape[0]),
        "float_label_source": builder_module,
        "tflite_top1": round(top1_accuracy(ref_u8, labels), 4),
        "ours_top1": round(top1_accuracy(ours, labels), 4),
        "top1_delta": round(top1_accuracy(ours, labels)
                            - top1_accuracy(ref_u8, labels), 4),
        "top1_agreement_ours_vs_tflite": round(top1_agreement(ours, ref_u8), 4),
        "element_agreement_1_quantum": round(
            element_agreement(ours, ref_u8, tolerance=1), 4),
        # Graded (non-saturating) metrics - a numerical regression moves
        # these long before any top-1 number flips (VERDICT r3 #7):
        "output_diff_ours_vs_tflite": diff_stats(ours, ref_u8),
        "top1_margin_quanta_ours": margin_stats(ours),
        "top1_margin_quanta_tflite": margin_stats(ref_u8),
    }


def main():
    import tensorflow as tf

    from qnnpack_tpu.io.accuracy import synth_images

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    images = synth_images(n)
    result = {"date": "2026-08-21",
              "dataset": f"{n} deterministic synthetic images "
                         "(io.accuracy.synth_images seed 17); labels = "
                         "float model argmax",
              "weights_provenance": (
                  "RANDOM-INIT He-redrawn Keras models, NOT pretrained "
                  "(scripts/make_tflite_model.py; no network access for "
                  "real weights in this environment).  Saturated top-1 "
                  "values (1.0 vs 1.0) therefore carry no accuracy "
                  "gradient by themselves; the graded metrics "
                  "(output_diff_*, top1_margin_*) are the regression "
                  "signal, and element_agreement_1_quantum is the "
                  "reference's operator contract "
                  "(test/convolution-operator-tester.h:461-464)")}
    for name, (asset, builder) in MODELS.items():
        path = os.path.join(REPO, "assets", asset)
        if not os.path.exists(path):
            result[name] = {"skipped": "asset missing"}
            continue
        result[name] = eval_model(tf, path, builder, images)
        print(name, json.dumps(result[name]), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
