"""Pallas TPU kernels: the microkernel layer (SURVEY.md section 2.1C, L3).

Reference-family -> TPU-kernel map (every family has a tested TPU-native
implementation; "XLA" means the idiomatic lowering is an XLA fusion in nn/,
chosen over a hand kernel for hardware reasons documented in each module):

  q8gemm        -> kernels.q8gemm.q8gemm_pallas       (MXU, fused requant)
  q8conv        -> kernels.q8conv.q8conv_pallas       (MXU implicit im2col)
  q8dwconv      -> kernels.q8dwconv.q8dwconv_pallas   (VPU, phase planes)
  q8vadd        -> kernels.vpu_ops.q8vadd_pallas      (VPU)
  u8clamp       -> kernels.vpu_ops.u8clamp_pallas     (VPU)
  u8rmax        -> kernels.vpu_ops.u8rmax_pallas      (VPU)
  u8maxpool     -> kernels.pool.u8maxpool_pallas      (VPU, fused clamp)
  q8avgpool     -> kernels.pool.q8avgpool_pallas      (VPU, fused requant)
  q8gavgpool    -> kernels.pool.q8gavgpool_pallas     (VPU, fused requant)
  x8lut         -> nn.elementwise.x8lut               (XLA gather - no VPU
                                                       byte gather exists)
  u8lut32norm   -> nn.elementwise.u8softargmax        (XLA gather + reduce)
  x8zip         -> nn.elementwise.x8zip               (XLA relayout/transpose)
  requantization-> quant.requantize                   (VPU epilogue library,
                                                       runs inside kernels)
  sgemm/sconv/
  sdwconv,hgemm -> nn.float_ops                       (fp32/bf16 MXU paths)

The XLA-vs-Pallas runtime choice per operator is owned by the dispatch table
(qnnpack_tpu.init), the analogue of the reference's cpuinfo-driven
qnnp_params fill (src/init.c:47-242).
"""

from .pool import (q8avgpool_pallas, q8gavgpool_pallas,  # noqa: F401
                   u8maxpool_pallas)
from .q8conv import q8conv_pallas  # noqa: F401
from .q8dwconv import q8dwconv_pallas  # noqa: F401
from .q8gemm import q8gemm_pallas  # noqa: F401
from .vpu_ops import q8vadd_pallas, u8clamp_pallas, u8rmax_pallas  # noqa: F401
