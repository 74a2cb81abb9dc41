"""Shared input layout for windowed Pallas kernels (conv/dwconv/pool).

The TPU-native replacement for the reference's indirection pointer buffers
(src/indirection.c): instead of per-(output, tap) pointers we materialize -
once, in XLA - a layout in which every kernel tap reads a unit-stride slice:

  1. spatial pad with a fill value (the biased input zero point for conv,
     0 for max pooling - the reference's zero-buffer / edge-clamp tricks),
  2. space-to-batch split into sh*sw phase planes so strided window access
     becomes unit-stride plane access,
  3. halo-duplicated output-row tiles so Pallas block specs (which cannot
     express overlapping windows) stay disjoint.

Tap (ky, kx) of output row-tile i then lives at phase plane
((ky*dh) % sh, (kx*dw) % sw), rows [oh, oh+ty), cols [ow, ow+wo) with
oh = (ky*dh) // sh, ow = (kx*dw) // sw - all static.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..nn.packing import round_up


def make_taps(kh: int, kw: int, strides, dilation):
    """Static (index, phase_h, phase_w, offset_h, offset_w) per kernel tap."""
    sh, sw = strides
    dh, dw = dilation
    return tuple(
        (ky * kw + kx,
         (ky * dh) % sh, (kx * dw) % sw,
         (ky * dh) // sh, (kx * dw) // sw)
        for ky in range(kh) for kx in range(kw))


def phase_halo_tiles(a, kh: int, kw: int, strides, dilation, padding,
                     ho: int, wo: int, ty: int, fill):
    """[B, H, W, C] -> [B, sh, sw, n_ht, th, wc, C] phase planes with halo.

    `fill` pads both the explicit spatial padding and the alignment slack,
    so padded taps behave exactly like the reference's zero rows.
    Returns (tiled array, n_ht, th, wc).
    """
    sh, sw = strides
    dh, dw = dilation
    b, h, w, c = a.shape
    (pt, pb), (pl_, pr) = padding

    n_ht = -(-ho // ty)
    max_oh = ((kh - 1) * dh) // sh
    max_ow = ((kw - 1) * dw) // sw
    th = ty + max_oh
    wc = wo + max_ow

    hp = round_up(max(h + pt + pb, (n_ht * ty - 1) * sh + (kh - 1) * dh + 1),
                  sh)
    wp = round_up(max(w + pl_ + pr, (wo - 1) * sw + (kw - 1) * dw + 1), sw)
    a = jnp.pad(a, ((0, 0), (pt, hp - h - pt), (pl_, wp - w - pl_), (0, 0)),
                constant_values=fill)

    # Space-to-batch: phase (p, q) plane row j, col i = input (j*sh+p, i*sw+q).
    hc, wc0 = hp // sh, wp // sw
    a = a.reshape(b, hc, sh, wc0, sw, c).transpose(0, 2, 4, 1, 3, 5)

    # Halo row tiles: tile i needs plane rows [i*ty, i*ty + th), clamped.
    row_idx = jnp.minimum(
        jnp.arange(n_ht)[:, None] * ty + jnp.arange(th)[None, :], hc - 1)
    a = a[:, :, :, row_idx, :wc, :]
    return a, n_ht, th, wc
