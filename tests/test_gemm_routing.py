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


V5E = config_mod.TuneParams("v5e", pallas_gemm_threshold=1 << 30,
                            pallas_gemm_ceiling_kzp=1 << 34,
                            pallas_small_gemm=True)


class TestGemmPathRule:
    def test_window_rule(self):
        # The measured v5e window (BENCH_GEMM_CROSSOVER.json): in-window
        # aligned shapes route to Pallas, everything else to XLA.
        _, packed = make_packed(n=1024, k=1024)
        args = dict(backend="tpu", mode="auto", tune=V5E)
        assert gemm_path((1024, 1024), packed, RP, **args) == "pallas"
        assert gemm_path((2048, 1024), packed, RP, **args) == "pallas"
        # 2048^3: the ceiling is kzp-dependent (BENCH_GEMM_CROSSOVER
        # round5_kzp: Pallas +21% at kzp != 0, XLA faster at kzp == 0).
        big, pbig = make_packed(n=2048, k=2048)  # kzp=103 (biased != 0)
        assert gemm_path((2048, 2048), pbig, RP, **args) == "pallas"
        w0 = RNG.integers(0, 256, size=(2048, 2048),
                          dtype=np.int64).astype(np.uint8)
        pbig0 = pack_gemm_weights(w0, None, 121, 128)  # kzp biased 0
        assert gemm_path((2048, 2048), pbig0, RP, **args) == "xla"
        # Above even the kzp ceiling:
        w4, p4 = make_packed(n=4096, k=4096)
        assert gemm_path((4096, 4096), p4, RP, **args) == "xla"
        # Below min_dim even when M*N*K is in-window:
        skinny, pskinny = make_packed(n=512, k=1024)
        assert gemm_path((4096, 1024), pskinny, RP, **args) == "xla"
        # Padding-hostile size inside the M*N*K window (1448^3 measured
        # 2.8x padded work; 1100^3 is the in-window equivalent):
        odd, podd = make_packed(n=1100, k=1100)
        assert gemm_path((1100, 1100), podd, RP, **args) == "xla"

    def test_threshold_none_means_retired(self):
        _, packed = make_packed(n=1024, k=1024)
        retired = config_mod.TuneParams("x", pallas_gemm_threshold=None)
        assert gemm_path((1024, 1024), packed, RP, backend="tpu",
                         mode="auto", tune=retired) == "xla"

    def test_non_tpu_backend_stays_on_xla(self):
        _, packed = make_packed(n=1024, k=1024)
        assert gemm_path((1024, 1024), packed, RP, backend="cpu",
                         mode="auto", tune=V5E) == "xla"

    def test_mode_overrides(self):
        _, packed = make_packed()
        assert gemm_path((4, packed.k), packed, RP, backend="tpu",
                         mode="always") == "pallas"
        _, p1k = make_packed(n=1024, k=1024)
        assert gemm_path((1024, 1024), p1k, RP, backend="tpu",
                         mode="never", tune=V5E) == "xla"
        with pytest.raises(ValueError):
            gemm_path((4, packed.k), packed, RP, mode="sometimes")

    def test_rank3_stays_on_xla_per_channel_routes_small(self):
        _, packed = make_packed()
        assert gemm_path((2, 4, packed.k), packed, RP, backend="tpu",
                         mode="always") == "xla"
        # Per-channel requant is no longer auto-excluded (VERDICT r3
        # missing #3): the small kernel's epilogue takes the scale vector
        # as a BlockSpec'd input, so "always" forces it there.
        pc = compute_per_channel_fp32_params(
            np.full(packed.n, 0.01, np.float32), 128)
        assert gemm_path((4, packed.k), packed, pc, backend="tpu",
                         mode="always") == "pallas_small"

    def test_small_gemm_window(self):
        # Measured v5e fat-N rule (BENCH_GEMM_SMALL.json): K<=1536,
        # N>=1280, M>=512, and (N>=2048 or M<=4096).
        def path(m, n, k):
            _, packed = make_packed(n, k)
            return gemm_path((m, k), packed, RP, backend="tpu",
                             mode="auto", tune=V5E)
        assert path(784, 1280, 320) == "pallas_small"   # +22% measured
        assert path(512, 3072, 768) == "pallas_small"   # +40% measured
        assert path(2048, 3072, 768) == "pallas_small"  # +70% measured
        assert path(6272, 1280, 320) == "xla"           # tie -> XLA
        assert path(3136, 256, 256) == "xla"            # thin N: XLA wins
        assert path(128, 768, 768) == "xla"             # M below window

    def test_small_gemm_vmem_guard(self):
        # ADVICE r4 medium #1: a vocab-style FC (K <= 1536, N >= 2048,
        # M >= 512 all pass the threshold rule) whose whole-W working set
        # exceeds VMEM must NOT route to the small kernel - K*N ~ 22 MB
        # cannot compile at any tile_m.
        from qnnpack_tpu.kernels.q8gemm_small import small_gemm_fits_vmem
        assert not small_gemm_fits_vmem(768, 30522)
        assert small_gemm_fits_vmem(768, 3072)
        w = np.zeros((30522, 768), np.uint8)
        packed = pack_gemm_weights(w, None, 121, 103)
        assert gemm_path((512, 768), packed, RP, backend="tpu",
                         mode="auto", tune=V5E) == "xla"

    def test_small_gemm_kernel_vmem_fallback(self, monkeypatch):
        # The kernel's own defensive fallback (shape forced in by
        # mode="always" or a stale tune table) must return the exact XLA
        # result instead of failing to compile.  Budget is shrunk so a
        # test-sized shape triggers the fallback branch.
        from qnnpack_tpu.kernels import q8gemm_small as mod
        # Odd shape -> guaranteed fresh jit trace under the patched budget.
        a = RNG.integers(0, 256, size=(63, 130), dtype=np.int64).astype(
            np.uint8)
        w, packed = make_packed(n=257, k=130)
        want = np.asarray(q8gemm(jnp.asarray(a), packed, RP))
        monkeypatch.setattr(mod, "VMEM_BUDGET_BYTES", 1024)
        got = np.asarray(mod.q8gemm_small_pallas(
            jnp.asarray(a), packed, RP, interpret=True))
        np.testing.assert_array_equal(got, want)

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
