#!/usr/bin/env python
"""Generate a real quantized MobileNetV2 TFLite checkpoint for the importer.

Builds Keras MobileNetV2 (1.0, 224; random init - this environment has no
network for pretrained weights, which does not affect the import contract:
same weights + same quant params must produce agreeing outputs) and runs
full-integer post-training quantization with a representative dataset, then
writes assets/mobilenet_v2_int8.tflite.  The TFLite flatbuffer carries real
per-channel int8 weights, per-tensor activation scales/zero-points - the
exact artifact class the reference consumes via Caffe2 exports
(/root/reference/README.md:63-147).

Run once (needs TensorFlow, which is baked into this image):
    python scripts/make_tflite_model.py
"""
import os
import sys

import numpy as np


def build_float_model(tf):
    """Deterministic float MobileNetV2 (seeded init); also the label source
    for the accuracy evaluation (scripts/accuracy_eval.py)."""
    tf.random.set_seed(7)
    model = tf.keras.applications.MobileNetV2(
        input_shape=(224, 224, 3), alpha=1.0, weights=None,
        classifier_activation=None)

    # Keras default glorot init under-scales ReLU nets: after ~53 layers the
    # activations decay to ~1e-6 and PTQ calibration produces a degenerate
    # (constant) quantized model.  Re-draw every kernel He-normal (variance
    # 2/fan_in, the ReLU-preserving choice) and give BN statistics mild
    # non-identity values so the fused conv+BN weights are "real-shaped".
    rng = np.random.default_rng(11)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            c = ws[0].shape[0]
            layer.set_weights([
                rng.uniform(0.9, 1.2, c).astype(np.float32),   # gamma
                rng.normal(0.0, 0.1, c).astype(np.float32),    # beta
                rng.normal(0.0, 0.05, c).astype(np.float32),   # moving mean
                rng.uniform(0.8, 1.2, c).astype(np.float32),   # moving var
            ])
        else:
            new = []
            for w in ws:
                if w.ndim >= 2:
                    fan_in = int(np.prod(w.shape[:-1]))
                    if w.ndim == 4 and w.shape[2] == 1 and w.shape[3] > 1:
                        fan_in = int(w.shape[0] * w.shape[1])  # depthwise
                    std = np.sqrt(2.0 / max(fan_in, 1))
                    new.append(rng.normal(0, std, w.shape).astype(np.float32))
                else:
                    new.append(rng.normal(0, 0.02, w.shape).astype(np.float32))
            layer.set_weights(new)
    return model, rng


def main():
    import tensorflow as tf

    model, rng = build_float_model(tf)
    probe = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    logits = model(probe, training=False).numpy()
    print("float logit std:", float(logits.std()))
    assert logits.std() > 1e-2, "activations collapsed; adjust init"

    def rep_dataset():
        rng2 = np.random.default_rng(0)
        for _ in range(32):
            # ImageNet-preprocessing range for MobileNetV2 is [-1, 1].
            yield [rng2.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep_dataset
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    blob = conv.convert()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "mobilenet_v2_int8.tflite")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob)/1e6:.2f} MB)")

    # Sanity: the quantized output scale must be non-degenerate, or the
    # agreement harness would pass trivially on constant logits.
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    od = interp.get_output_details()[0]
    scale, zp = od["quantization"]
    print("output quant:", scale, zp)
    assert scale > 1e-4, f"degenerate output scale {scale}"


if __name__ == "__main__":
    main()
