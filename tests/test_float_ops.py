"""Float path tests: sgemm / sconv / sdwconv / hgemm analogues.

Mirrors the reference's float microkernel tests (test/sgemm.cc, sconv.cc,
hgemm.cc): random inputs, a plain numpy reference, clamp saturation cases.
fp32 asserts exact equality (same-order MXU accumulation is deterministic);
bf16 asserts within bf16 rounding of the fp32 reference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qnnpack_tpu.nn.float_ops import hgemm, sconv2d, sdwconv2d, sgemm

RNG = np.random.default_rng(0xF00D)


@pytest.mark.parametrize("m,n,k", [(1, 8, 8), (5, 17, 23), (32, 128, 64)])
def test_sgemm(m, n, k):
    a = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    bias = RNG.standard_normal((n,), dtype=np.float32)
    want = np.clip(a @ w + bias, -1.0, 1.0)
    got = np.asarray(sgemm(a, w, bias, output_min=-1.0, output_max=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sgemm_no_bias_no_clamp():
    a = RNG.standard_normal((4, 16), dtype=np.float32)
    w = RNG.standard_normal((16, 8), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(sgemm(a, w)), a @ w,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("m,n,k", [(8, 8, 8), (16, 64, 32)])
def test_hgemm_bf16(m, n, k):
    a = RNG.standard_normal((m, k), dtype=np.float32)
    w = RNG.standard_normal((k, n), dtype=np.float32)
    bias = RNG.standard_normal((n,), dtype=np.float32)
    a16 = jnp.asarray(a, jnp.bfloat16)
    w16 = jnp.asarray(w, jnp.bfloat16)
    want = np.asarray(a16, np.float32) @ np.asarray(w16, np.float32) + bias
    got = np.asarray(hgemm(a16, w16, bias), dtype=np.float32)
    assert got.dtype == np.float32  # cast back for comparison
    # bf16 store: 8-bit mantissa -> ~2^-8 relative tolerance.
    np.testing.assert_allclose(got, want, rtol=1 / 128, atol=1 / 64)


def test_hgemm_clamp():
    a = jnp.ones((4, 8), jnp.bfloat16) * 10
    w = jnp.ones((8, 4), jnp.bfloat16)
    got = np.asarray(hgemm(a, w, output_min=-5.0, output_max=5.0),
                     dtype=np.float32)
    np.testing.assert_array_equal(got, np.full((4, 4), 5.0, np.float32))


def _np_conv2d(a, w_hwio, strides, padding, dilation, groups):
    b, h, wd, c = a.shape
    kh, kw, icpg, o = w_hwio.shape
    (pt, pb), (pl_, pr) = padding
    a = np.pad(a, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    sh, sw = strides
    dh, dw = dilation
    ho = (a.shape[1] - ((kh - 1) * dh + 1)) // sh + 1
    wo = (a.shape[2] - ((kw - 1) * dw + 1)) // sw + 1
    ocpg = o // groups
    out = np.zeros((b, ho, wo, o), np.float32)
    for g in range(groups):
        ain = a[..., g * icpg:(g + 1) * icpg]
        wg = w_hwio[..., g * ocpg:(g + 1) * ocpg]
        for y in range(ho):
            for x in range(wo):
                patch = ain[:, y * sh:y * sh + (kh - 1) * dh + 1:dh,
                            x * sw:x * sw + (kw - 1) * dw + 1:dw, :]
                out[:, y, x, g * ocpg:(g + 1) * ocpg] = np.einsum(
                    "bijc,ijco->bo", patch, wg)
    return out


@pytest.mark.parametrize("groups", [1, 4])
def test_sconv2d(groups):
    a = RNG.standard_normal((2, 9, 9, 8), dtype=np.float32)
    w = RNG.standard_normal((3, 3, 8 // groups, 12), dtype=np.float32)
    want = _np_conv2d(a, w, (2, 2), ((1, 1), (1, 1)), (1, 1), groups)
    got = np.asarray(sconv2d(a, w, strides=(2, 2),
                             padding=((1, 1), (1, 1)), groups=groups))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sdwconv2d():
    c = 16
    a = RNG.standard_normal((2, 8, 8, c), dtype=np.float32)
    w = RNG.standard_normal((3, 3, c), dtype=np.float32)
    want = _np_conv2d(a, w.reshape(3, 3, 1, c), (1, 1), ((1, 1), (1, 1)),
                      (1, 1), c)
    got = np.asarray(sdwconv2d(a, w, padding=((1, 1), (1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
