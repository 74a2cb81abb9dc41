"""Model zoo: end-to-end quantized networks built on the framework ops.

Coverage mirrors the reference's benchmark model tables
(bench/convolution.cc:108-962) plus the BASELINE.json stretch configs:
MobileNet v1/v2, ShuffleNet v1 (configurable groups) / v2 (x0.5-x2.0),
SqueezeNet 1.1, ResNet-18/50, VGG-16, an ENet-style deconv segmentation
net, and an int8 BERT encoder on the q8gemm/q8bmm path."""

from .bert import BertConfig, bert_encoder_forward, build_bert_encoder  # noqa: F401
from .enet import enet_seg  # noqa: F401
from .graph import GraphBuilder, GraphSpec, graph_forward  # noqa: F401
from .mobilenet_v2 import (  # noqa: F401
    INVERTED_RESIDUAL_CFG, build_mobilenet_v2, mobilenet_v2_forward,
)
from .zoo import (  # noqa: F401
    mobilenet_v1, resnet18, resnet50, shufflenet_v1, shufflenet_v2,
    squeezenet_v10, squeezenet_v11, vgg16,
)
