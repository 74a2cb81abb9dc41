"""Spatial (sequence-parallel analogue) sharding: conv over sharded H.

The reference has no attention and therefore no sequence/context parallelism;
its structural analogue is the spatial dimension, which it splits across
threads one output row at a time (operator-run.c:675-679).  Scaled across
chips, the same split needs *halo exchange*: each shard owns a contiguous
band of input rows and borrows `pad_top` rows from the neighbor above and
`pad_bottom` rows from the neighbor below before convolving
(SURVEY.md sections 2.2 and 5.7 - this module is the CP/ring-attention slot).

Implementation: `jax.shard_map` over one mesh axis; neighbor rows move with
`lax.ppermute` (a neighbor shift over ICI); edge shards substitute the biased
input zero point, exactly reproducing the unsharded operator's zero-point
padding - so the sharded conv is bit-identical to the single-chip result.
Requantization is positionwise, so no cross-shard reduction is needed and
int8 bit-exactness survives the sharding (unlike TP, nothing is even summed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _ring_shift(x, axis_name: str, n_shards: int, toward_lower: bool):
    """Shift shard contents one step along the shard chain; the vacated edge
    shard receives zeros (replaced by the caller with zero-point fill).

    toward_lower=True: shard i receives x from shard i+1."""
    if toward_lower:
        perm = [(i, i - 1) for i in range(1, n_shards)]
    else:
        perm = [(i, i + 1) for i in range(n_shards - 1)]
    return lax.ppermute(x, axis_name, perm=perm)


def spatial_conv2d(x_u8, packed, rparams, mesh: Mesh,
                   axis: str = "data", strides=(1, 1),
                   padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """Quantized conv with the input H dimension sharded over `mesh[axis]`.

    Bit-identical to the unsharded nn.conv.q8conv2d.  Requires the
    even-output-split geometry:

        pad_top + pad_bottom == (kh - 1) * dh + 1 - stride_h   (ho == h/sh)
        h % (n_shards * stride_h) == 0

    which covers the "SAME"-style convolutions CNN backbones use.  The halo
    a shard borrows is then exactly (pad_top) rows from above and
    (pad_bottom) rows from below; edge shards use zero-point fill instead.
    Output returns with H sharded the same way.
    """
    from ..nn.conv import q8conv2d

    n = mesh.shape[axis]
    b, h, w, c = x_u8.shape
    sh, sw = strides
    (pt, pb), pad_w = padding
    kh = packed.kernel_height
    dh, _ = dilation
    eff_h = (kh - 1) * dh + 1
    if pt + pb != eff_h - sh:
        raise ValueError(
            f"spatial_conv2d needs pad_top+pad_bottom == {eff_h - sh} "
            f"(even output split), got {pt}+{pb}")
    if h % (n * sh) != 0:
        raise ValueError(
            f"H={h} must divide into {n} shards of a multiple of stride {sh}")
    hs = h // n
    if max(pt, pb) > hs:
        raise ValueError(f"halo {max(pt, pb)} exceeds shard height {hs}")
    izp_u8 = jnp.uint8((packed.izp_biased + 128) & 0xFF)

    def local(x_local):
        idx = lax.axis_index(axis)
        parts = []
        if pt > 0:
            # The shard above contributes its last pt rows; shard 0 pads.
            prev_rows = _ring_shift(x_local[:, -pt:], axis, n,
                                    toward_lower=False)
            parts.append(jnp.where(idx == 0,
                                   jnp.full_like(prev_rows, izp_u8),
                                   prev_rows))
        parts.append(x_local)
        if pb > 0:
            next_rows = _ring_shift(x_local[:, :pb], axis, n,
                                    toward_lower=True)
            parts.append(jnp.where(idx == n - 1,
                                   jnp.full_like(next_rows, izp_u8),
                                   next_rows))
        x_ext = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x_local
        return q8conv2d(x_ext, packed, rparams, strides=strides,
                        padding=((0, 0), pad_w), dilation=dilation)

    spec = P(None, axis, None, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x_u8)
