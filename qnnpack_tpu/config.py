"""Runtime configuration and hardware-keyed tuning tables.

The TPU analogue of the reference's cpuinfo-driven dispatch (src/init.c:47-242
probes the CPU microarchitecture and fills per-uarch tile parameters and
thresholds, e.g. the XZP kthreshold table at init.c:69-84).  Here the probe is
`jax.devices()[0].device_kind` and the table keys TPU generations to MXU tile
shapes and kernel-choice thresholds; selection happens at trace time and is
baked into the jitted program.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax

from .utils.logging import log_info


@dataclasses.dataclass(frozen=True)
class TuneParams:
    """Per-generation kernel tuning (the qnnp_params analogue,
    src/qnnpack/params.h:520-538)."""

    generation: str
    # Pallas q8gemm tile shapes (the mr/nr/kr analogue).
    gemm_tile_m: int = 1024
    gemm_tile_n: int = 1024
    gemm_tile_k: int = 1024
    # Pallas-vs-XLA GEMM routing window (the per-uarch gemm-vs-xzp
    # kthreshold analogue, init.c:69-84), consumed by nn.gemm.gemm_path().
    # Measured on v5e 2026-08-21 (BENCH_GEMM_CROSSOVER.json): the Pallas
    # kernel wins +23% at 1024^3 (300,660 vs 243,716 GOPS), loses narrowly
    # at 2048^3 (269,523 vs 277,437) and clearly at >= 2896^3, and loses
    # badly wherever tile padding inflates the work (1448^3: 86,013 vs
    # 219,976, 2.8x padded).
    # Route to Pallas iff threshold <= M*N*K <= ceiling AND
    # min(M,N,K) >= min_dim AND tile-padding waste <= max_pad_waste.
    # threshold None = Pallas retired on this generation (no win window).
    pallas_gemm_threshold: int | None = None
    pallas_gemm_ceiling: int = 1 << 31
    # kzp != 0 widens the window: XLA's dynamic-zero-point epilogue
    # dependency costs it more than the Pallas kernel's in-kernel row
    # sums, flipping 2048^3 to Pallas (+21%, stable across two interleaved
    # confirmation rounds, BENCH_GEMM_CROSSOVER.json round5_kzp; 2896^3
    # still XLA 0.74x, 4096^3 XLA 0.95x) - ceiling 2^34 includes 2048^3
    # (2^33) and excludes 2896^3 (~2^34.5).
    pallas_gemm_ceiling_kzp: int = 1 << 31
    pallas_gemm_min_dim: int = 1024
    pallas_gemm_max_pad_waste: float = 1.05
    # Small-shape (skinny) GEMM kernel (kernels/q8gemm_small.py): K untiled,
    # M-only grid, W resident in VMEM.  Measured win region on v5e
    # (BENCH_GEMM_SMALL.json, 2026-08-21): the kernel wins FAT-N shapes -
    # +22% at 784x1280x320, +40% at 512x3072x768, +70% at 2048x3072x768,
    # +8% at 3136x1280x320 - and ties/loses everywhere N < 1280 (XLA wins
    # thin-N by 13-58%) and at N=1280 once M reaches 6272 (tie).  Rule:
    # route iff K <= small_max_k AND N >= small_min_n AND M >= small_min_m
    # AND (N >= small_fat_n OR M <= small_max_m_mid_n).  Enabled
    # per-generation only after a measured win; False = not measured.
    pallas_small_gemm: bool = False
    pallas_small_min_n: int = 1280
    pallas_small_min_m: int = 512
    pallas_small_max_k: int = 1536
    pallas_small_fat_n: int = 2048
    pallas_small_max_m_mid_n: int = 4096
    small_tile_m: int = 1024
    # Grouped 1x1 conv lowering: block-diagonal dot_general (group axis as
    # a batch dim) vs XLA's feature_group_count conv.  Measured on v5e
    # (2026-08-21): the dot_general form wins ~2x at batch 1 (g3 b1
    # 0.579 -> 0.320 ms e2e, BENCH_MODELS.json) and the crossover sweep
    # (BENCH_GROUPED_1X1.json, b in {32,48,64,96,128} x ShuffleNet
    # g2/g3/g4/g8 shapes) shows it TIES OR LOSES at every b >= 32
    # (ratios 0.71-1.01) - so the gate at 32 is the measured ceiling,
    # no longer borrowed from the dwconv rule.  Additionally the sweep
    # caught XLA:TPU MISCOMPILING the batched int8 block-diag dot at
    # g4 544->136 b96/b128 (45-61% of int32 accumulators wrong vs the
    # numpy loop nest; the feature_group_count conv is exact there), so
    # batches above the gate must stay on the conv path for correctness,
    # not just speed.  b <= 32 cells verified bit-exact for all swept
    # shapes.
    grouped_1x1_einsum_max_batch: int = 32
    # Above the einsum gate, grouped 1x1 can instead run as g independent
    # dense dots over channel slices (split-GEMMs): measured v5e
    # 2026-08-21 (BENCH_GROUPED_1X1.json split_gemms rows) this wins
    # 1.1-2.7x over feature_group_count conv at 28x28-class spatial for
    # g <= 3 at every batch 48-128 and ties/loses at 14x14 b >= 96.  The
    # original sweep excluded g >= 4 from 14px cells only; the follow-up
    # 28px cells (split_g48 section, same artifact) show g4 wins there
    # too (272->68 1.59x, 68->272 2.89x; shufflenet_v1_g4 b128 e2e
    # validated) while g8 loses (384->96 0.70x - the per-group unroll
    # overhead at 8 dots outweighs the conv path's inefficiency), so the
    # gate is g <= 4.
    grouped_1x1_split_max_groups: int = 4
    grouped_1x1_split_min_pixels: int = 784
    # Pallas stem kernel (kernels/q8stem.py): stride-2 C_in <= 4 dense
    # convs (every CNN stem in the model table).  STATUS 2026-08-21:
    # RETIRED, False on every generation - six formulations measured or
    # compile-probed in BENCH_STEM.json all lose to XLA's native lowering
    # (per-tap Pallas 4-10x slower: Mosaic cannot assemble im2col lanes -
    # strided lane slices and sub-128-lane concatenation fail to
    # legalize).  The class's 32-44% of analytic roofline is the
    # backend's practical frontier; routing discipline per
    # src/init.c:69-84: no dispatch without a measured win.
    conv_stem_pallas: bool = False
    conv_stem_s2d_max_cin: int = 4
    # Strided depthwise conv Pallas window.  STATUS 2026-08-21 round 5:
    # RETIRED (False everywhere) on END-TO-END evidence
    # (BENCH_DWCONV_WINDOW.json): the round-1 "XLA collapse" that
    # motivated the window is an ISOLATED-PROGRAM phenomenon - isolated
    # strided dwconvs still show Pallas wins up to 8.3x at b8, but inside
    # a full jitted model XLA never hits the collapse mode, and e2e with
    # the window ON measures 0.70x (imported per-channel MobileNetV2 b1)
    # to 1.00x (zoo b1/b8) - never a win.  The rule below stays wired for
    # a future data-backed re-enable; per-channel scales are now plumbed
    # through the kernel either way.
    dwconv_pallas_strided: bool = False
    dwconv_pallas_min_pixels: int = 8192
    dwconv_pallas_max_batch: int = 32
    # int8 native peak (TOPS) and HBM bandwidth (GB/s) for roofline
    # reporting: roofline time = max(flops/peak, bytes/bandwidth).
    int8_peak_tops: float = 394.0
    hbm_gbps: float = 819.0


_TUNE_TABLE = {
    # device_kind (prefix match, lowercase) -> params.
    # v5e rows MEASURED on hardware (dwconv rule: r1 measurements in
    # nn/conv.py; gemm tile + threshold: BENCH_GEMM_CROSSOVER.json;
    # small-GEMM rule: BENCH_GEMM_SMALL.json).  int8_peak/hbm are the NOMINAL
    # spec sheet values used for roofline reporting only - benches probe
    # the same-day delivered capability separately (BENCH_NOTES.md).
    "tpu v5 lite": TuneParams("v5e", pallas_gemm_threshold=1 << 30,
                              pallas_gemm_ceiling_kzp=1 << 34,
                              pallas_small_gemm=True,
                              int8_peak_tops=394.0, hbm_gbps=819.0),
    "tpu v5e": TuneParams("v5e", pallas_gemm_threshold=1 << 30,
                          pallas_gemm_ceiling_kzp=1 << 34,
                          pallas_small_gemm=True,
                          int8_peak_tops=394.0, hbm_gbps=819.0),
    # v5p / v6e rows are ESTIMATES (spec-sheet peaks, v5e-tuned thresholds
    # carried over unmeasured - no such hardware in this environment).
    "tpu v5": TuneParams("v5p", int8_peak_tops=918.0, hbm_gbps=2765.0),
    "tpu v6": TuneParams("v6e", gemm_tile_k=1024, int8_peak_tops=1836.0,
                         hbm_gbps=1638.0),
    "cpu": TuneParams("cpu", gemm_tile_m=32, gemm_tile_k=128,
                      dwconv_pallas_strided=False, int8_peak_tops=0.0,
                      hbm_gbps=0.0),
}


@functools.cache
def tune_params() -> TuneParams:
    """Probe the first device and return its tuning record."""
    kind = jax.devices()[0].device_kind.lower()
    for prefix, params in _TUNE_TABLE.items():
        if kind.startswith(prefix):
            log_info("tuning for device kind %r -> %s", kind, params.generation)
            return params
    log_info("unknown device kind %r; using generic parameters", kind)
    return TuneParams("generic")


@dataclasses.dataclass
class Config:
    """Global framework configuration (the per-op `flags` + build-option
    analogue, include/qnnpack.h:64 / CMakeLists.txt:15-19)."""

    default_requant: str = os.environ.get("QNNPACK_TPU_REQUANT", "fp32")
    # GEMM kernel routing (consumed by nn.gemm.gemm_path):
    #   "auto"   measured threshold rule from TuneParams (default)
    #   "never"  always the XLA lowering
    #   "always" always the Pallas kernel where legal (2-D, per-tensor
    #            requant); interpreted off-TPU so tests can exercise it
    pallas_mode: str = {"0": "never", "1": "always"}.get(
        os.environ.get("QNNPACK_TPU_PALLAS", "auto"),
        os.environ.get("QNNPACK_TPU_PALLAS", "auto"))
    compilation_cache_dir: str | None = os.environ.get(
        "QNNPACK_TPU_CACHE_DIR", None)


config = Config()


def initialize():
    """qnnp_initialize analogue (include/qnnpack.h:34; src/init.c:244-258):
    idempotent one-time setup - probes the device, optionally enables the
    persistent compilation cache.  Unlike the reference there is no global
    dispatch-table fill; kernel choice happens at trace time via
    tune_params()."""
    if config.compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          config.compilation_cache_dir)
    return tune_params()
