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
