"""Accuracy-parity metrics for imported real-weight models.

The reference's operator tests accept outputs within 0.9 quantum of an int32
reference (test/convolution-operator-tester.h:461-464); at model level the
same contract becomes element agreement within one quantum plus top-1
agreement between our execution and the source framework's interpreter.
"""

from __future__ import annotations

import numpy as np


def element_agreement(a_u8, b_u8, tolerance: int = 0) -> float:
    """Fraction of elements with |a - b| <= tolerance quanta."""
    a = np.asarray(a_u8).astype(np.int32)
    b = np.asarray(b_u8).astype(np.int32)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float((np.abs(a - b) <= tolerance).mean())


def top1_agreement(logits_a, logits_b) -> float:
    """Fraction of rows whose argmax class matches."""
    a = np.asarray(logits_a)
    b = np.asarray(logits_b)
    return float((a.argmax(-1) == b.argmax(-1)).mean())


def top1_accuracy(logits, labels) -> float:
    """Top-1 accuracy of logits against integer labels."""
    return float((np.asarray(logits).argmax(-1) ==
                  np.asarray(labels).ravel()).mean())
