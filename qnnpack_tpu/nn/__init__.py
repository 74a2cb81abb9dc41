"""Functional operator implementations (the XLA compute path)."""

from .conv import (  # noqa: F401
    PackedConvWeights, deconv_output_dims, pack_conv_weights, q8conv2d,
    q8conv2d_acc, q8deconv2d,
)
from .dtypes import (  # noqa: F401
    biased_i8_to_u8, biased_zero_point, u8_to_biased_i8,
)
from .elementwise import (  # noqa: F401
    add_quantize, build_leaky_relu_lut, build_sigmoid_lut,
    build_softargmax_lut, clamp_u8, u8softargmax, x8lut, x8zip,
)
from .gemm import q8gemm, q8gemm_acc  # noqa: F401
from .packing import (  # noqa: F401
    PackedGemmWeights, pack_gemm_weights, pad_to_multiple, round_up,
)
from .pool import q8avgpool2d, q8gavgpool, u8maxpool2d  # noqa: F401
from .requant_dispatch import apply_requant, make_requant_params  # noqa: F401
