"""Requantization numerics tests.

Mirrors the reference's test strategy for src/requantization/
(test/requantization.cc, 116 cases): exact power-of-two division, rounding
direction, special/edge values, random sweeps, and q31-vs-gemmlowp
cross-validation.  The on-device 32-bit-limb implementations are asserted
bit-exact against independent numpy int64 oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qnnpack_tpu.quant import int_arith as ia
from qnnpack_tpu.quant import oracles, params, requantize

RNG = np.random.default_rng(0x517EC0DE)

EDGE_INT32 = np.array([
    0, 1, -1, 2, -2, 3, -3, 127, -127, 128, -128, 255, -255, 256, -256,
    2**15 - 1, -(2**15), 2**16, -(2**16), 2**30 - 1, 2**30, -(2**30),
    2**31 - 1, -(2**31), -(2**31) + 1, 0x40000000, -0x40000000,
    0x7FFFFFFF, -0x7FFFFFFF,
], dtype=np.int64).astype(np.int32)


def random_int32(n, rng=RNG):
    return rng.integers(-(2**31), 2**31, size=n, dtype=np.int64).astype(np.int32)


def sample_inputs(n=4096):
    return np.concatenate([EDGE_INT32, random_int32(n)])


# ---------------------------------------------------------------------------
# int_arith primitives vs numpy int64
# ---------------------------------------------------------------------------

class TestIntArith:
    def test_umul32_wide(self):
        a = RNG.integers(0, 2**32, size=4096, dtype=np.uint64).astype(np.uint32)
        b = RNG.integers(0, 2**32, size=4096, dtype=np.uint64).astype(np.uint32)
        hi, lo = ia.umul32_wide(jnp.asarray(a), jnp.asarray(b))
        prod = a.astype(np.uint64) * b.astype(np.uint64)
        np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))

    def test_smul32_wide(self):
        a = random_int32(4096)
        b = random_int32(4096)
        hi, lo = ia.smul32_wide(jnp.asarray(a), jnp.asarray(b))
        prod = a.astype(np.int64) * b.astype(np.int64)
        np.testing.assert_array_equal(
            np.asarray(hi), (prod >> 32).astype(np.int64).astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))

    def test_smul32_wide_edges(self):
        edges = np.array([0, 1, -1, 2**31 - 1, -(2**31), 0x40000000,
                          -0x40000000], dtype=np.int64).astype(np.int32)
        a, b = np.meshgrid(edges, edges)
        a, b = a.ravel(), b.ravel()
        hi, lo = ia.smul32_wide(jnp.asarray(a), jnp.asarray(b))
        prod = a.astype(np.int64) * b.astype(np.int64)
        np.testing.assert_array_equal(
            np.asarray(hi), (prod >> 32).astype(np.int64).astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))

    def test_add64(self):
        vals = RNG.integers(0, 2**64, size=(2, 4096), dtype=np.uint64)
        s = vals[0] + vals[1]  # wraps mod 2^64
        hi, lo = ia.add64(
            jnp.asarray((vals[0] >> 32).astype(np.uint32)),
            jnp.asarray((vals[0] & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((vals[1] >> 32).astype(np.uint32)),
            jnp.asarray((vals[1] & 0xFFFFFFFF).astype(np.uint32)))
        np.testing.assert_array_equal(np.asarray(hi), (s >> 32).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(lo), (s & 0xFFFFFFFF).astype(np.uint32))

    @pytest.mark.parametrize("shift", [0, 1, 16, 31, 32, 33, 48, 63])
    def test_shr64(self, shift):
        vals = RNG.integers(0, 2**64, size=1024, dtype=np.uint64)
        got = ia.shr64_lo32(
            jnp.asarray((vals >> 32).astype(np.uint32)),
            jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)), shift)
        want = ((vals >> shift) & 0xFFFFFFFF).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.parametrize("shift", [16, 31, 32, 33, 55])
    def test_asr64_lo32(self, shift):
        # Values whose arithmetic shift fits in int32.
        vals = RNG.integers(-(2**(31 + shift)), 2**(31 + shift) - 1,
                            size=1024, dtype=np.int64) if shift < 33 else \
            RNG.integers(-(2**62), 2**62, size=1024, dtype=np.int64)
        shifted = np.right_shift(vals, shift)
        mask_fits = (shifted >= -(2**31)) & (shifted < 2**31)
        vals = vals[mask_fits]
        shifted = shifted[mask_fits]
        got = ia.asr64_lo32(
            jnp.asarray((vals.astype(np.uint64) >> 32).astype(np.uint32)),
            jnp.asarray((vals.astype(np.uint64) & 0xFFFFFFFF).astype(np.uint32)),
            shift)
        np.testing.assert_array_equal(
            np.asarray(ia.i32(got)), shifted.astype(np.int32))


# ---------------------------------------------------------------------------
# Requantization schemes vs oracles
# ---------------------------------------------------------------------------

def _scales_po2():
    """Exact power-of-two scales, 2^-1 .. 2^-31."""
    return [float(np.ldexp(np.float32(1.0), -k)) for k in range(1, 32)]


def _scales_random(n=20):
    rng = np.random.default_rng(42)
    # Uniform over valid exponent range with random mantissas.
    out = []
    for _ in range(n):
        exp = rng.integers(-20, 0)
        mant = rng.uniform(1.0, 2.0)
        s = float(np.float32(np.ldexp(mant, int(exp) - 1)))
        if 2**-32 <= s < 1.0:
            out.append(s)
    return out


class TestQ31:
    @pytest.mark.parametrize("scale", _scales_po2()[:8] + _scales_random(8))
    @pytest.mark.parametrize("zero_point", [0, 128, 255])
    def test_random(self, scale, zero_point):
        p = params.compute_q31_params(scale, zero_point)
        x = sample_inputs()
        got = np.asarray(requantize.requantize_q31(jnp.asarray(x), p))
        want = oracles.oracle_q31(x, p)
        np.testing.assert_array_equal(got, want)

    def test_exact_divide_by_po2(self):
        # scale = 2^-k on multiples of 2^k must divide exactly
        # (requantization-tester.h exact-divide contract).
        for k in range(1, 20):
            p = params.compute_q31_params(float(np.ldexp(1.0, -k)), 128)
            x = (RNG.integers(-(2**(31 - k)), 2**(31 - k), size=512,
                              dtype=np.int64) << k).astype(np.int32)
            got = np.asarray(requantize.requantize_q31(jnp.asarray(x), p))
            want = np.clip((x >> k) + 128, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, want)

    def test_saturation(self):
        p = params.compute_q31_params(0.25, 128, qmin=10, qmax=200)
        x = sample_inputs()
        got = np.asarray(requantize.requantize_q31(jnp.asarray(x), p))
        assert got.min() >= 10 and got.max() <= 200
        np.testing.assert_array_equal(got, oracles.oracle_q31(x, p))

    def test_match_gemmlowp(self):
        # Cross-validation of q31 against gemmlowp semantics on random inputs
        # (test/requantization.cc:304 `random_match_gemmlowp`).
        for scale in _scales_random(10):
            q = params.compute_q31_params(scale, 128)
            g = params.compute_gemmlowp_params(scale, 128)
            x = random_int32(2048)
            got_q = np.asarray(requantize.requantize_q31(jnp.asarray(x), q))
            got_g = np.asarray(requantize.requantize_gemmlowp(jnp.asarray(x), g))
            np.testing.assert_array_equal(got_q, got_g)


class TestPrecise:
    @pytest.mark.parametrize("scale", _scales_po2()[:8] + _scales_random(8))
    @pytest.mark.parametrize("zero_point", [0, 1, 128, 255])
    def test_random(self, scale, zero_point):
        p = params.compute_precise_params(scale, zero_point)
        x = sample_inputs()
        got = np.asarray(requantize.requantize_precise(jnp.asarray(x), p))
        want = oracles.oracle_precise(x, p)
        np.testing.assert_array_equal(got, want)

    def test_rounding_away_from_zero(self):
        # scale 2^-1: +-1 -> +-1 (0.5 rounds away), +-3 -> +-2.
        p = params.compute_precise_params(0.5, 128)
        x = np.array([1, -1, 3, -3, 5, -5], dtype=np.int32)
        got = np.asarray(requantize.requantize_precise(jnp.asarray(x), p))
        want = np.array([129, 127, 130, 126, 131, 125], dtype=np.uint8)
        np.testing.assert_array_equal(got, want)


class TestFP32:
    @pytest.mark.parametrize("scale", _scales_random(10))
    def test_random(self, scale):
        p = params.compute_fp32_params(scale, 128)
        x = sample_inputs()
        got = np.asarray(requantize.requantize_fp32(jnp.asarray(x), p))
        want = oracles.oracle_fp32(x, p)
        np.testing.assert_array_equal(got, want)

    def test_ties_to_even(self):
        p = params.compute_fp32_params(0.5, 128)
        x = np.array([1, -1, 3, -3], dtype=np.int32)
        got = np.asarray(requantize.requantize_fp32(jnp.asarray(x), p))
        # 0.5 -> 0, 1.5 -> 2 (half to even)
        want = np.array([128, 128, 130, 126], dtype=np.uint8)
        np.testing.assert_array_equal(got, want)


class TestGemmlowp:
    @pytest.mark.parametrize("scale", _scales_po2()[:6] + _scales_random(8))
    @pytest.mark.parametrize("zero_point", [0, 128, 255])
    def test_random(self, scale, zero_point):
        p = params.compute_gemmlowp_params(scale, zero_point)
        x = sample_inputs()
        got = np.asarray(requantize.requantize_gemmlowp(jnp.asarray(x), p))
        want = oracles.oracle_gemmlowp(x, p)
        np.testing.assert_array_equal(got, want)


class TestAvgPool:
    @pytest.mark.parametrize("scale", [2**-10, 1.0 / 9.0, 1.0 / 49.0, 0.9, 3.7, 255.0])
    @pytest.mark.parametrize("zero_point", [0, 128, 255])
    def test_random(self, scale, zero_point):
        p = params.compute_avgpool_quant_params(0, scale, zero_point)
        x = sample_inputs()
        got = np.asarray(requantize.avgpool_quantize(jnp.asarray(x), p))
        want = oracles.oracle_avgpool(x, p)
        np.testing.assert_array_equal(got, want)


class TestAdd:
    @pytest.mark.parametrize("a_scale,b_scale", [
        (0.5, 0.5), (0.125, 1.75), (100.0, 0.01), (2**-14, 255.0), (1.0, 1.0)])
    def test_random(self, a_scale, b_scale):
        p = params.compute_add_quant_params(10, 200, 128, a_scale, b_scale)
        a = RNG.integers(0, 256, size=4096, dtype=np.int64).astype(np.uint8)
        b = RNG.integers(0, 256, size=4096, dtype=np.int64).astype(np.uint8)
        got = np.asarray(requantize.add_quantize(jnp.asarray(a), jnp.asarray(b), p))
        want = oracles.oracle_add(a, b, p)
        np.testing.assert_array_equal(got, want)

    def test_full_exhaustive_small(self):
        p = params.compute_add_quant_params(127, 63, 128, 0.25, 0.75)
        a, b = np.meshgrid(np.arange(256, dtype=np.uint8),
                           np.arange(256, dtype=np.uint8))
        a, b = a.ravel(), b.ravel()
        got = np.asarray(requantize.add_quantize(jnp.asarray(a), jnp.asarray(b), p))
        np.testing.assert_array_equal(got, oracles.oracle_add(a, b, p))


class TestJitCompatibility:
    def test_schemes_under_jit(self):
        x = jnp.asarray(sample_inputs(256))
        p = params.compute_q31_params(0.125, 128)
        jit_fn = jax.jit(lambda v: requantize.requantize_q31(v, p))
        np.testing.assert_array_equal(
            np.asarray(jit_fn(x)),
            np.asarray(requantize.requantize_q31(x, p)))


class TestBarrettDivision:
    """u32_div_floor must equal true uint32 floor division over the full
    domain (it backs the softargmax normalization, nn/elementwise.py)."""

    def test_exact_vs_uint64_division(self):
        import jax.numpy as jnp
        from qnnpack_tpu.quant.int_arith import (u32_barrett_magic,
                                                 u32_div_floor)
        rng = np.random.default_rng(7)
        n = rng.integers(0, 1 << 32, 100000, dtype=np.uint64)
        s = rng.integers(1, 1 << 32, 100000, dtype=np.uint64)
        # near-multiples stress the correction steps; corner divisors
        # stress the magic (s=1 overflows it and is special-cased).
        k = rng.integers(0, 300, 20000).astype(np.uint64)
        ss = rng.integers(1, 1 << 31, 20000, dtype=np.uint64)
        prod = (k * ss) % (1 << 32)
        n = np.concatenate([n, prod, (prod + 1) % (1 << 32),
                            (prod - 1) % (1 << 32)])
        s = np.concatenate([s] + [ss] * 3)
        s[:12] = [1, 1, 2, 3, (1 << 32) - 1, 1 << 31, (1 << 31) + 1, 5,
                  255, 256, 7, 1 << 24]
        want = (n // s).astype(np.uint32)
        nu = jnp.asarray(n.astype(np.uint32))
        su = jnp.asarray(s.astype(np.uint32))
        got = np.asarray(u32_div_floor(nu, su, u32_barrett_magic(su)))
        np.testing.assert_array_equal(got, want)
