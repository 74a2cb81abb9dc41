"""Host IO: native preprocessing bindings + prefetching input pipeline."""

from .native import (  # noqa: F401
    c_requantize, dequantize, native_available, quantize,
    resize_quantize_batch,
)
from .pipeline import BatchPrefetcher, image_pipeline  # noqa: F401
