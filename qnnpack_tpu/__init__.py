"""qnnpack_tpu: a TPU-native quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
pytorch/QNNPACK (reference at /root/reference): asymmetric-uint8 quantized
convolution, deconvolution, depthwise convolution, fully-connected, pooling,
and elementwise operators, with bit-exact requantization numerics, an
operator create/setup/run/delete lifecycle, and SPMD scaling over TPU device
meshes.

Layer map (TPU equivalents of SURVEY.md section 1):
  - quant/    requantization numerics (requantization.h + src/requantization/)
  - kernels/  Pallas TPU kernels (the q8gemm/q8conv/... microkernel layer)
  - nn/       functional operator implementations (XLA path)
  - ops/      operator lifecycle API (create/setup/run/delete, L0/L1)
  - models/   model zoo (quantized MobileNetV2 and friends)
  - parallel/ device-mesh sharding and collectives (the pthreadpool analogue)
"""

from .status import (  # noqa: F401
    InvalidParameterError, QnnpackError, Status, UninitializedError,
    UnsupportedParameterError,
)

__version__ = "0.1.0"
