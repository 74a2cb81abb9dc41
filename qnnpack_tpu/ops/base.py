"""Operator lifecycle: the L0/L1 equivalent of the reference's C API.

The reference's create -> setup -> run -> delete lifecycle
(include/qnnpack.h:40-332) maps onto TPU-native phases:

  create -> validate params (mirroring the reference's self-explaining
            rejection messages), precompute quantization params, pack weights
            into a device pytree
  setup  -> bind input shapes; on TPU this is a shape-specialized jit trace,
            cached per shape (the analogue of the reference's amortizable
            indirection-buffer rebuild, SURVEY.md 3.3)
  run    -> call the jitted program
  delete -> release references (Python GC; `delete()` provided for parity)

Status codes surface as exceptions carrying `qnnpack_tpu.Status` values.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax

from ..status import InvalidParameterError, UnsupportedParameterError


def check(cond: bool, message: str):
    """Validation with reference-style diagnostics (every rejected parameter
    explains itself; cf. convolution.c:76-168)."""
    if not cond:
        raise InvalidParameterError(message)


def check_supported(cond: bool, message: str):
    if not cond:
        raise UnsupportedParameterError(message)


def check_scale(scale: float, name: str):
    check(scale > 0.0 and math.isfinite(scale),
          f"failed to create operator with {scale:.7g} {name} scale: "
          f"scale must be finite and positive")


def check_range(output_min: int, output_max: int):
    check(0 <= output_min <= 255 and 0 <= output_max <= 255
          and output_min <= output_max,
          f"failed to create operator with [{output_min}, {output_max}] "
          f"output range: range min must be below range max within [0, 255]")


def check_zero_point(zp: int, name: str):
    check(0 <= zp <= 255,
          f"failed to create operator with {zp} {name} zero point: "
          f"zero point must be in [0, 255]")


class Operator:
    """Base operator: shape-cached jit execution.

    Subclasses set `self._forward` (a function of packed params + inputs) at
    create time; `__call__` runs the jitted program, retracing only on new
    input shapes (jax.jit's cache is the setup cache)."""

    name = "operator"

    def __init__(self):
        self._jitted: Callable[..., Any] | None = None

    def _make_jitted(self):
        raise NotImplementedError

    def __call__(self, *inputs):
        if self._jitted is None:
            self._jitted = self._make_jitted()
        return self._jitted(*inputs)

    def delete(self):
        """Parity with qnnp_delete_operator (operator-delete.c); frees the
        compiled-program references."""
        if self._jitted is not None:
            try:
                self._jitted.clear_cache()
            except AttributeError:
                pass
        self._jitted = None

    def lower(self, *example_inputs):
        """Expose the jitted lowering for inspection/AOT compilation."""
        if self._jitted is None:
            self._jitted = self._make_jitted()
        return self._jitted.lower(*example_inputs)


def jit_forward(fn):
    """jit with the operator's packed params passed as traced pytree args."""
    return jax.jit(fn)
