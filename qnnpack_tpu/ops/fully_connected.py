"""Fully-connected operator (qnnp_create_fully_connected_nc_q8,
include/qnnpack.h:118-140; src/fully-connected.c:25-160).

Like the reference, FC reuses the GEMM path directly (fully-connected.c
packs with pack_q8gemm_w and tags ukernel_type_gemm); input is
[batch, input_channels] uint8."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn.gemm import q8gemm, q8gemm_routed
from ..nn.packing import pack_gemm_weights
from ..nn.requant_dispatch import make_requant_params
from .base import (Operator, check, check_range, check_scale,
                   check_supported, check_zero_point)


class FullyConnected(Operator):
    name = "fully_connected"

    def __init__(self, *, kernel, bias, input_zero_point, input_scale,
                 kernel_zero_point, kernel_scale, output_zero_point,
                 output_scale, output_min=0, output_max=255, requant="q31",
                 use_pallas=None):
        super().__init__()
        kernel = jnp.asarray(kernel, jnp.uint8)
        check(kernel.ndim == 2,
              "fully connected kernel must be [output_channels, input_channels]")
        check_scale(input_scale, "input")
        check_scale(kernel_scale, "kernel")
        check_scale(output_scale, "output")
        fc_scale = float(input_scale) * float(kernel_scale) / float(output_scale)
        check_supported(fc_scale < 1.0 and math.isfinite(fc_scale),
                        f"failed to create fully connected operator with "
                        f"{fc_scale:.7g} requantization scale: scale must be "
                        f"below 1.0 (fully-connected.c:85-92)")
        check_zero_point(input_zero_point, "input")
        check_zero_point(kernel_zero_point, "kernel")
        check_zero_point(output_zero_point, "output")
        check_range(output_min, output_max)

        self.input_channels = int(kernel.shape[1])
        self.output_channels = int(kernel.shape[0])
        self.rparams = make_requant_params(requant, fc_scale,
                                           output_zero_point, output_min,
                                           output_max)
        self.packed = pack_gemm_weights(kernel, bias, input_zero_point,
                                        kernel_zero_point)
        self.use_pallas = use_pallas

    def _make_jitted(self):
        """use_pallas=None (default) routes per the measured dispatch rule
        (nn.gemm.gemm_path); True/False force the Pallas/XLA kernel."""
        rp = self.rparams
        if self.use_pallas is None:
            def forward(x, packed):
                return q8gemm_routed(x, packed, rp)
        elif self.use_pallas:
            from ..kernels.q8gemm import q8gemm_pallas

            def forward(x, packed):
                return q8gemm_pallas(x, packed, rp,
                                     interpret=jax.default_backend() != "tpu")
        else:
            def forward(x, packed):
                return q8gemm(x, packed, rp)
        fn = jax.jit(forward)
        return lambda x: fn(x, self.packed)
