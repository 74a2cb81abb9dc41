"""Utility subsystem tests: checkpoint round-trip, cost counters, config."""

import numpy as np

import jax
import jax.numpy as jnp

from qnnpack_tpu import config as config_mod
from qnnpack_tpu import models
from qnnpack_tpu.models.graph import graph_forward
from qnnpack_tpu.utils import graph_cost, load_params, save_params, total_cost


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    params, spec = models.mobilenet_v1(rng, width_mult=0.25, num_classes=10)
    path = str(tmp_path / "bundle.npz")
    save_params(path, params)
    restored = load_params(path)

    x = jnp.asarray(rng.integers(0, 256, (1, 224, 224, 3),
                                 dtype=np.int64).astype(np.uint8))
    fwd = jax.jit(lambda p, v: graph_forward(p, spec, v))
    np.testing.assert_array_equal(np.asarray(fwd(params, x)),
                                  np.asarray(fwd(restored, x)))
    # Structural equality of records
    for a, b in zip(params, restored):
        if a is None:
            assert b is None
            continue
        assert type(a) is type(b)
        np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))


def test_graph_cost_counts():
    rng = np.random.default_rng(4)
    params, spec = models.mobilenet_v1(rng)
    costs = graph_cost(spec, (1, 224, 224, 3))
    total = total_cost(spec, (1, 224, 224, 3))
    # MobileNetV1 1.0_224 is ~569M MACs; synthetic variant should be within
    # a factor of ~1.2 of the canonical number (fc/bias bookkeeping aside).
    assert 450e6 < total.macs < 700e6, total.macs
    assert costs[0].name == "stem"
    assert costs[0].macs == 1 * 112 * 112 * 32 * 3 * 3 * 3


def test_tune_params_probe():
    tp = config_mod.tune_params()
    assert tp.generation in ("cpu", "v5e", "v5p", "v6e", "generic")
    assert config_mod.initialize() is tp


def test_measure_loop_scan_harness():
    """The timing harness must produce positive, finite per-iteration time
    with a dispersion stat, and its loop must be lax.scan-based so
    elementwise bodies synchronize on the axon backend (BENCH_NOTES.md
    'Async dispatch of elementwise-only programs')."""
    from qnnpack_tpu.utils.timing import measure_loop

    w = jnp.ones((64, 64), jnp.float32)
    m = measure_loop(lambda v: jnp.matmul(v, w), jnp.ones((64, 64)),
                     chain=True, min_seconds=0.02, repeats=3,
                     est_seconds=1e-5)
    assert m.seconds > 0 and np.isfinite(m.seconds)
    assert m.dispersion >= 0
    assert m.n_iters & (m.n_iters - 1) == 0  # power of two

    # elementwise body (the axon-problematic case) must also measure
    m2 = measure_loop(lambda v: v + jnp.uint8(1),
                      jnp.zeros((1024, 1024), jnp.uint8), chain=True,
                      min_seconds=0.02, repeats=3, est_seconds=1e-5)
    assert m2.seconds > 0
