"""Plain numpy int32/int64 reference implementations for operator tests.

The analogue of the reference's in-fixture C++ loop nests
(test/convolution-operator-tester.h:365-406 etc.): float-free integer
accumulators computed independently of the library under test.
"""

from __future__ import annotations

import numpy as np


def conv2d_acc(a, w, bias, a_zp, w_zp, strides=(1, 1), padding=((0, 0), (0, 0)),
               dilation=(1, 1), groups=1):
    """int32 conv accumulator.  a: uint8 [B,H,W,C]; w: uint8 [O,Kh,Kw,Icpg];
    padding taps behave as input zero point (contribute 0)."""
    b, h, wd, c = a.shape
    o, kh, kw, icpg = w.shape
    assert c == groups * icpg
    ocpg = o // groups
    sy, sx = strides
    dy, dx = dilation
    (pt, pb), (pl, pr) = padding
    a32 = a.astype(np.int32) - a_zp
    a32 = np.pad(a32, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    w32 = w.astype(np.int32) - w_zp
    hp, wp = a32.shape[1], a32.shape[2]
    ho = (hp - ((kh - 1) * dy + 1)) // sy + 1
    wo = (wp - ((kw - 1) * dx + 1)) // sx + 1
    out = np.zeros((b, ho, wo, o), np.int32)
    for oy in range(ho):
        for ox in range(wo):
            for ky in range(kh):
                for kx in range(kw):
                    patch = a32[:, oy * sy + ky * dy, ox * sx + kx * dx, :]  # [B, C]
                    patch = patch.reshape(b, groups, icpg)
                    wk = w32[:, ky, kx, :].reshape(groups, ocpg, icpg)
                    out[:, oy, ox, :] += np.einsum(
                        "bgi,goi->bgo", patch, wk).reshape(b, o)
    return out + bias[None, None, None, :]


def deconv2d_acc(a, w, bias, a_zp, w_zp, strides=(1, 1),
                 padding=((0, 0), (0, 0)), adjustment=(0, 0), dilation=(1, 1),
                 groups=1):
    """int32 transposed-conv accumulator.
    output[b, sy*iy - pt + ky*dy, sx*ix - pl + kx*dx, o] +=
        (a - za)(w[o,ky,kx,i] - zw)."""
    b, h, wd, c = a.shape
    o, kh, kw, icpg = w.shape
    ocpg = o // groups
    sy, sx = strides
    dy, dx = dilation
    (pt, pb), (pl, pr) = padding
    eff_h, eff_w = (kh - 1) * dy + 1, (kw - 1) * dx + 1
    ho = sy * (h - 1) + adjustment[0] + eff_h - (pt + pb)
    wo = sx * (wd - 1) + adjustment[1] + eff_w - (pl + pr)
    a32 = a.astype(np.int32) - a_zp
    w32 = w.astype(np.int32) - w_zp
    out = np.zeros((b, ho, wo, o), np.int32)
    for iy in range(h):
        for ix in range(wd):
            for ky in range(kh):
                for kx in range(kw):
                    oy = sy * iy - pt + ky * dy
                    ox = sx * ix - pl + kx * dx
                    if not (0 <= oy < ho and 0 <= ox < wo):
                        continue
                    patch = a32[:, iy, ix, :].reshape(b, groups, icpg)
                    wk = w32[:, ky, kx, :].reshape(groups, ocpg, icpg)
                    out[:, oy, ox, :] += np.einsum(
                        "bgi,goi->bgo", patch, wk).reshape(b, o)
    return out + bias[None, None, None, :]


def maxpool2d(a, pool_size, strides, padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """uint8 max pooling with edge-excluded padding taps."""
    b, h, w, c = a.shape
    ph, pw = pool_size
    sy, sx = strides
    dy, dx = dilation
    (pt, pb), (pl, pr) = padding
    hp, wp = h + pt + pb, w + pl + pr
    ho = (hp - ((ph - 1) * dy + 1)) // sy + 1
    wo = (wp - ((pw - 1) * dx + 1)) // sx + 1
    out = np.zeros((b, ho, wo, c), np.uint8)
    for oy in range(ho):
        for ox in range(wo):
            best = np.zeros((b, c), np.uint8)
            for ky in range(ph):
                for kx in range(pw):
                    y = oy * sy + ky * dy - pt
                    x = ox * sx + kx * dx - pl
                    if 0 <= y < h and 0 <= x < w:
                        best = np.maximum(best, a[:, y, x, :])
            out[:, oy, ox, :] = best
    return out


def avgpool2d_acc(a, a_zp, pool_size, strides, padding=((0, 0), (0, 0))):
    """int32 accumulator: sum (x - izp) over real window pixels."""
    b, h, w, c = a.shape
    ph, pw = pool_size
    sy, sx = strides
    (pt, pb), (pl, pr) = padding
    ho = (h + pt + pb - ph) // sy + 1
    wo = (w + pl + pr - pw) // sx + 1
    a32 = a.astype(np.int32) - a_zp
    out = np.zeros((b, ho, wo, c), np.int32)
    for oy in range(ho):
        for ox in range(wo):
            for ky in range(ph):
                for kx in range(pw):
                    y = oy * sy + ky - pt
                    x = ox * sx + kx - pl
                    if 0 <= y < h and 0 <= x < w:
                        out[:, oy, ox, :] += a32[:, y, x, :]
    return out


def softargmax(x, lut_u32):
    """uint8 softmax rows via the uint32 LUT (u8lut32norm/scalar.c)."""
    x = np.asarray(x, np.uint8).astype(np.int64)
    t = np.asarray(lut_u32, np.uint32).astype(np.int64)
    out = np.zeros_like(x, dtype=np.uint8)
    for r in range(x.shape[0]):
        row = x[r]
        m = row.max()
        e = t[row + (255 - m)]
        s = int(e.sum() & 0xFFFFFFFF)
        q = ((e * 256 + (s >> 1)) & 0xFFFFFFFF) // s
        out[r] = np.minimum(q, 255).astype(np.uint8)
    return out
