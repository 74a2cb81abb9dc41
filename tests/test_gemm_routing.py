"""GEMM kernel routing (nn.gemm.gemm_path / q8gemm_routed).

The dispatch-table discipline of the reference (src/init.c:53-84 selects the
q8gemm ukernel and XZP kthreshold per microarchitecture) applied to the
XLA-vs-Pallas choice: the rule must be consumed by real code paths, forceable
both ways, and bit-exact whichever kernel it picks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qnnpack_tpu import config as config_mod
from qnnpack_tpu.nn import make_requant_params, pack_gemm_weights
from qnnpack_tpu.nn.gemm import gemm_path, q8gemm, q8gemm_routed
from qnnpack_tpu.quant.params import compute_per_channel_fp32_params

RNG = np.random.default_rng(0xD15B)


def make_packed(n=32, k=64):
    w = RNG.integers(0, 256, size=(n, k), dtype=np.int64).astype(np.uint8)
    bias = RNG.integers(-1000, 1000, size=(n,)).astype(np.int32)
    return w, pack_gemm_weights(w, bias, 121, 103)


RP = make_requant_params("fp32", 0.01, 128)


class TestGemmPathRule:
    def test_threshold_routes_large_to_pallas(self):
        _, packed = make_packed()
        thr = 8 * packed.n * packed.k
        assert gemm_path((8, packed.k), packed, RP, backend="tpu",
                         mode="auto", threshold=thr) == "pallas"
        assert gemm_path((7, packed.k), packed, RP, backend="tpu",
                         mode="auto", threshold=thr) == "xla"

    def test_threshold_none_means_retired(self):
        _, packed = make_packed()
        assert gemm_path((1 << 20, packed.k), packed, RP, backend="tpu",
                         mode="auto", threshold=None) == "xla"

    def test_non_tpu_backend_stays_on_xla(self):
        _, packed = make_packed()
        assert gemm_path((1 << 20, packed.k), packed, RP, backend="cpu",
                         mode="auto", threshold=1) == "xla"

    def test_mode_overrides(self):
        _, packed = make_packed()
        assert gemm_path((4, packed.k), packed, RP, backend="tpu",
                         mode="always") == "pallas"
        assert gemm_path((1 << 20, packed.k), packed, RP, backend="tpu",
                         mode="never", threshold=1) == "xla"
        with pytest.raises(ValueError):
            gemm_path((4, packed.k), packed, RP, mode="sometimes")

    def test_rank3_and_per_channel_stay_on_xla(self):
        _, packed = make_packed()
        assert gemm_path((2, 4, packed.k), packed, RP, backend="tpu",
                         mode="always") == "xla"
        pc = compute_per_channel_fp32_params(
            np.full(packed.n, 0.01, np.float32), 128)
        assert gemm_path((4, packed.k), packed, pc, backend="tpu",
                         mode="always") == "xla"

    def test_tune_table_thresholds_are_consumed_types(self):
        # Every generation row must carry a valid threshold (int or None) -
        # the knob is read by gemm_path, so a bad type would break dispatch.
        for tp in config_mod._TUNE_TABLE.values():
            assert tp.pallas_gemm_threshold is None or \
                isinstance(tp.pallas_gemm_threshold, int)


class TestRoutedBitExact:
    def _case(self, m=16, n=32, k=48):
        a = RNG.integers(0, 256, size=(m, k), dtype=np.int64).astype(np.uint8)
        w, packed = make_packed(n, k)
        return jnp.asarray(a), packed

    def test_forced_pallas_matches_xla(self, monkeypatch):
        a, packed = self._case()
        want = np.asarray(q8gemm(a, packed, RP))
        monkeypatch.setattr(config_mod.config, "pallas_mode", "always")
        got = np.asarray(q8gemm_routed(a, packed, RP))
        np.testing.assert_array_equal(got, want)

    def test_forced_never_matches_xla(self, monkeypatch):
        a, packed = self._case()
        want = np.asarray(q8gemm(a, packed, RP))
        monkeypatch.setattr(config_mod.config, "pallas_mode", "never")
        got = np.asarray(q8gemm_routed(a, packed, RP))
        np.testing.assert_array_equal(got, want)

    def test_fc_operator_routes(self, monkeypatch):
        from qnnpack_tpu.ops.fully_connected import FullyConnected
        w = RNG.integers(0, 256, size=(8, 24), dtype=np.int64).astype(np.uint8)
        bias = RNG.integers(-100, 100, size=(8,)).astype(np.int32)
        kw = dict(kernel=w, bias=bias, input_zero_point=121, input_scale=0.5,
                  kernel_zero_point=103, kernel_scale=0.4,
                  output_zero_point=128, output_scale=10.0, requant="fp32")
        x = RNG.integers(0, 256, size=(4, 24), dtype=np.int64).astype(np.uint8)
        ref = FullyConnected(use_pallas=False, **kw)
        want = np.asarray(ref(jnp.asarray(x)))
        monkeypatch.setattr(config_mod.config, "pallas_mode", "always")
        routed = FullyConnected(**kw)  # use_pallas=None -> gemm_path
        np.testing.assert_array_equal(np.asarray(routed(jnp.asarray(x))), want)
