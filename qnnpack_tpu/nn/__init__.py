"""Functional operator implementations (the XLA compute path)."""

from .dtypes import (  # noqa: F401
    biased_i8_to_u8, biased_zero_point, u8_to_biased_i8,
)
from .gemm import q8gemm, q8gemm_acc  # noqa: F401
from .packing import (  # noqa: F401
    PackedGemmWeights, pack_gemm_weights, pad_to_multiple, round_up,
)
from .requant_dispatch import apply_requant, make_requant_params  # noqa: F401
