"""Packed-weight bundle save/load.

The reference is stateless (weights copied at create, convolution.c:207-311)
and repacks on every process start.  Here create-time packing is cacheable:
a params pytree (PackedGemmWeights / PackedConvWeights records) serializes to
one .npz bundle, so model load skips quantize+pack (SURVEY.md section 5.4).
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp

from ..nn.conv import PackedConvWeights
from ..nn.packing import PackedGemmWeights

_KINDS = {"gemm": PackedGemmWeights, "conv": PackedConvWeights}


def _meta(record) -> dict:
    fields = {f for f in record.__dataclass_fields__} - {"w", "bias_folded"}
    kind = "gemm" if isinstance(record, PackedGemmWeights) else "conv"
    return {"kind": kind, **{f: getattr(record, f) for f in fields}}


def save_params(path: str, params):
    """Serialize a list-of-packed-records pytree (None entries preserved)."""
    arrays = {}
    metas = []
    for i, p in enumerate(params):
        if p is None:
            metas.append(None)
            continue
        metas.append(_meta(p))
        arrays[f"w_{i}"] = np.asarray(p.w)
        arrays[f"b_{i}"] = np.asarray(p.bias_folded)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(metas).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_params(path: str):
    """Load a bundle saved by save_params; arrays land on the default device."""
    with np.load(path) as z:
        metas = json.loads(bytes(z["__meta__"].tobytes()).decode())
        out = []
        for i, meta in enumerate(metas):
            if meta is None:
                out.append(None)
                continue
            kind = meta.pop("kind")
            cls = _KINDS[kind]
            out.append(cls(w=jnp.asarray(z[f"w_{i}"]),
                           bias_folded=jnp.asarray(z[f"b_{i}"]), **meta))
    return out
