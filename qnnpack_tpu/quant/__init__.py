"""Quantization numerics core: the contract every kernel is tested against.

TPU-native re-implementation of the reference's requantization layer
(/root/reference/src/qnnpack/requantization.h and src/requantization/).
"""

from .params import (  # noqa: F401
    AddQuantParams, AvgPoolQuantParams, ClampParams, ConvQuantParams,
    FP32Params, GemmlowpParams, PerChannelFP32Params, PreciseParams,
    Q31Params, compute_add_quant_params, compute_avgpool_quant_params,
    compute_conv_quant_params, compute_fp32_params, compute_gemmlowp_params,
    compute_per_channel_fp32_params, compute_precise_params,
    compute_q31_params, compute_u8_clamping_params, fp32_from_bits,
    fp32_to_bits,
)
from .requantize import (  # noqa: F401
    add_quantize, avgpool_quantize, clamp_u8, q31_multiply, requantize_fp32,
    requantize_fp32_per_channel, requantize_gemmlowp, requantize_precise,
    requantize_q31, round_shift_q31,
)
