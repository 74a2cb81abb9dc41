"""Native library + IO pipeline tests: the C requantization oracles must
agree bit-exactly with the numpy oracles (three independent implementations
of the same contract), and the C++ preprocessing must match its numpy
fallback."""

import numpy as np
import pytest

from qnnpack_tpu.io import native
from qnnpack_tpu.quant import oracles, params

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library not built")

RNG = np.random.default_rng(0xC0DE)


class TestCRequantOracles:
    @pytest.mark.parametrize("scale", [0.5, 0.125, 0.0003, 2**-20, 0.999])
    @pytest.mark.parametrize("zp", [0, 128, 255])
    def test_match_numpy_oracles(self, scale, zp):
        x = RNG.integers(-(2**31), 2**31, 4096, dtype=np.int64).astype(np.int32)
        cases = {
            "q31": oracles.oracle_q31(x, params.compute_q31_params(scale, zp)),
            "precise": oracles.oracle_precise(
                x, params.compute_precise_params(scale, zp)),
            "fp32": oracles.oracle_fp32(
                x, params.compute_fp32_params(scale, zp)),
            "gemmlowp": oracles.oracle_gemmlowp(
                x, params.compute_gemmlowp_params(scale, zp)),
        }
        for scheme, want in cases.items():
            got = native.c_requantize(scheme, x, scale, zp)
            np.testing.assert_array_equal(got, want, err_msg=scheme)


class TestImagePrep:
    def test_resize_quantize_matches_numpy(self):
        imgs = RNG.standard_normal((4, 37, 53, 3)).astype(np.float32) * 10
        got = native.resize_quantize_batch(imgs, (224, 224), 0.1, 128)
        want = native._numpy_resize_quantize(imgs, (224, 224), 0.1, 128)
        # lrintf vs np.rint both round half-to-even; bilinear arithmetic can
        # differ in the last float ulp -> allow off-by-one quantum.
        diff = got.astype(np.int32) - want.astype(np.int32)
        assert np.abs(diff).max() <= 1
        assert (diff != 0).mean() < 0.01

    def test_identity_resize(self):
        imgs = RNG.standard_normal((2, 16, 16, 3)).astype(np.float32)
        got = native.resize_quantize_batch(imgs, (16, 16), 0.05, 128)
        want = native.quantize(imgs, 0.05, 128)
        np.testing.assert_array_equal(got, want)

    def test_quantize_dequantize_roundtrip(self):
        x = RNG.standard_normal((1000,)).astype(np.float32)
        q = native.quantize(x, 0.05, 128)
        d = native.dequantize(q, 0.05, 128)
        assert np.abs(d - np.clip(x, -128 * 0.05, 127 * 0.05)).max() <= 0.026


class TestPipeline:
    def test_prefetcher_end_to_end(self):
        import jax
        from qnnpack_tpu.io import image_pipeline

        batches = [RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
                   for _ in range(5)]
        out = list(image_pipeline(batches, (16, 16), 0.1, 128, prefetch=2))
        assert len(out) == 5
        for o in out:
            assert isinstance(o, jax.Array)
            assert o.shape == (2, 16, 16, 3) and o.dtype == np.uint8

    def test_prefetcher_propagates_errors(self):
        from qnnpack_tpu.io import BatchPrefetcher

        def bad_source():
            yield np.zeros((1, 4, 4, 3), np.float32)
            raise RuntimeError("source failed")

        it = BatchPrefetcher(bad_source())
        next(it)
        with pytest.raises(RuntimeError, match="source failed"):
            next(it)
