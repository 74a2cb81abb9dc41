#!/usr/bin/env python
"""Generate a quantized SqueezeNet-1.1 TFLite checkpoint (second importer
asset, VERDICT r2 #7).

SqueezeNet 1.1 is one of the reference's benchmark models
(/root/reference/bench/convolution.cc:591-641) and - unlike MobileNetV2's
linear chain - its fire modules are genuine branch topology: every fire
ends in a channel CONCATENATION of the 1x1 and 3x3 expand branches, which
exercises the importer's tensor-indexed environment and CONCAT support.

Same protocol as make_tflite_model.py: random He-normal init (no network
for pretrained weights; the import contract is agreement, not accuracy),
full-integer PTQ with a representative dataset, int8 in/out.

Run once: python scripts/make_squeezenet_tflite.py
"""
import os

import numpy as np


def fire(tf, x, squeeze, expand, name):
    sq = tf.keras.layers.Conv2D(squeeze, 1, activation="relu",
                                name=f"{name}_squeeze")(x)
    e1 = tf.keras.layers.Conv2D(expand, 1, activation="relu",
                                name=f"{name}_e1x1")(sq)
    e3 = tf.keras.layers.Conv2D(expand, 3, padding="same", activation="relu",
                                name=f"{name}_e3x3")(sq)
    return tf.keras.layers.Concatenate(axis=-1, name=f"{name}_cat")([e1, e3])


def build_float_model(tf):
    """Deterministic float SqueezeNet 1.1 (seeded init); also the label
    source for scripts/accuracy_eval.py."""
    tf.random.set_seed(11)
    inp = tf.keras.Input((224, 224, 3))
    x = tf.keras.layers.Conv2D(64, 3, strides=2, activation="relu",
                               name="conv1")(inp)
    x = tf.keras.layers.MaxPool2D(3, 2, name="pool1")(x)
    x = fire(tf, x, 16, 64, "fire2")
    x = fire(tf, x, 16, 64, "fire3")
    x = tf.keras.layers.MaxPool2D(3, 2, name="pool3")(x)
    x = fire(tf, x, 32, 128, "fire4")
    x = fire(tf, x, 32, 128, "fire5")
    x = tf.keras.layers.MaxPool2D(3, 2, name="pool5")(x)
    x = fire(tf, x, 48, 192, "fire6")
    x = fire(tf, x, 48, 192, "fire7")
    x = fire(tf, x, 64, 256, "fire8")
    x = fire(tf, x, 64, 256, "fire9")
    x = tf.keras.layers.Conv2D(1000, 1, activation="relu", name="conv10")(x)
    x = tf.keras.layers.GlobalAveragePooling2D(name="gap")(x)
    model = tf.keras.Model(inp, x)

    # He-normal re-init so PTQ calibration sees non-degenerate activations
    # (Keras glorot under-scales deep ReLU stacks; see make_tflite_model.py).
    rng = np.random.default_rng(13)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        new = []
        for w in ws:
            if w.ndim >= 2:
                fan_in = int(np.prod(w.shape[:-1]))
                std = np.sqrt(2.0 / max(fan_in, 1))
                new.append(rng.normal(0, std, w.shape).astype(np.float32))
            else:
                new.append(rng.normal(0, 0.05, w.shape).astype(np.float32))
        layer.set_weights(new)
    return model, rng


def main():
    import tensorflow as tf

    model, rng = build_float_model(tf)
    probe = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    out = model(probe, training=False).numpy()
    print("float output std:", float(out.std()))
    assert out.std() > 1e-3, "activations collapsed; adjust init"

    def rep_dataset():
        rng2 = np.random.default_rng(0)
        for _ in range(32):
            yield [rng2.uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)]

    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    conv.representative_dataset = rep_dataset
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    conv.inference_input_type = tf.int8
    conv.inference_output_type = tf.int8
    blob = conv.convert()

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "squeezenet_v11_int8.tflite")
    with open(dst, "wb") as f:
        f.write(blob)
    print(f"wrote {dst} ({len(blob)/1e6:.2f} MB)")

    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    od = interp.get_output_details()[0]
    scale, zp = od["quantization"]
    print("output quant:", scale, zp)
    assert scale > 1e-5, f"degenerate output scale {scale}"


if __name__ == "__main__":
    main()
