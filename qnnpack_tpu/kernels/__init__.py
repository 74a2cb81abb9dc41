"""Pallas TPU kernels (the microkernel layer, L3 equivalent)."""

from .q8gemm import q8gemm_pallas  # noqa: F401
