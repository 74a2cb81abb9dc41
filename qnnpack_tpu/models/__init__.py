"""Model zoo: end-to-end quantized networks built on the framework ops.

Coverage mirrors the reference's benchmark model tables
(bench/convolution.cc:108-962): MobileNet v1/v2, ShuffleNet v1/v2,
SqueezeNet, ResNet - added incrementally, MobileNetV2 first (the headline
workload)."""

from .mobilenet_v2 import (  # noqa: F401
    INVERTED_RESIDUAL_CFG, build_mobilenet_v2, mobilenet_v2_forward,
)
