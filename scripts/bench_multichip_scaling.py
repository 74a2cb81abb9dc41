#!/usr/bin/env python
"""DP scaling shape on the virtual CPU mesh (VERDICT r3 next-round #8).

Multi-chip hardware is not available in this environment, and the host has
only 2 physical cores - so a virtual 8-device mesh cannot demonstrate 8x
throughput no matter how good the sharding is (XLA host "devices" are
threads time-sliced onto those 2 cores).  What the experiment CAN
demonstrate, and what this script measures, is that the batch-sharded
program does not SERIALIZE or duplicate work:

  - strong scaling, fixed global batch: the same forward is run unsharded
    on 1 device and batch-sharded over 2/4/8 virtual devices.  The
    1-device baseline already saturates both cores via XLA CPU intra-op
    threading, so the ideal curve is FLAT (~1.0x); if the sharded program
    introduced hidden cross-device sync, replication, or resharding
    copies, its wall-clock would fall well below 1.0x of the baseline.

The committed artifact (MULTICHIP_SCALING.json) reports time ratios vs
the 1-device run with that 2-core ceiling stated.  Real-chip scaling
rides the same jax.sharding layouts the driver's dryrun_multichip
compiles every round (parallel/mesh.py batch_sharding + shard_params).

Run: python scripts/bench_multichip_scaling.py   (forces JAX_PLATFORMS=cpu;
run on an otherwise idle host - concurrent load pollutes the ratios)
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qnnpack_tpu.models.mobilenet_v2 import (build_mobilenet_v2,
                                             mobilenet_v2_forward)
from qnnpack_tpu.parallel import (batch_sharding, make_mesh, shard_params,
                                  sharded_inference_fn)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MULTICHIP_SCALING.json")

GLOBAL_BATCH = 16
SIZE = 96  # small spatial size keeps CPU conv time tractable, same graph


def timed(fn, params, x, iters=5):
    fn(params, x).block_until_ready()  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(params, x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    params, spec = build_mobilenet_v2(rng, input_size=SIZE, requant="fp32")
    x_np = rng.integers(0, 256, (GLOBAL_BATCH, SIZE, SIZE, 3),
                        dtype=np.int64).astype(np.uint8)
    rows = {}
    t1 = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        p_sh = shard_params(params, mesh)
        x_sh = jax.device_put(jnp.asarray(x_np), batch_sharding(mesh))
        fwd = sharded_inference_fn(
            lambda p, v: mobilenet_v2_forward(p, spec, v), mesh)
        dt = timed(fwd, p_sh, x_sh)
        if t1 is None:
            t1 = dt
        rows[str(n_dev)] = {"ms": round(dt * 1e3, 2),
                            "speedup_vs_1dev": round(t1 / dt, 2)}
        print(f"devices={n_dev} batch={GLOBAL_BATCH}: {dt*1e3:.1f} ms "
              f"(speedup {t1/dt:.2f}x)", flush=True)

    with open(OUT, "w") as f:
        json.dump({
            "date": "2026-08-21",
            "mode": ("strong scaling, fixed global batch, virtual CPU mesh "
                     "(XLA host devices time-sliced onto the physical "
                     "cores).  The 1-device baseline already uses every "
                     "core via XLA CPU intra-op threading, so the ideal "
                     "curve is FLAT (~1.0x); the experiment's signal is "
                     "the absence of sharding-induced overhead (a program "
                     "that serialized or replicated work would fall well "
                     "below 1.0).  NOT real-chip rates."),
            "host_cores": os.cpu_count(),
            "model": f"mobilenet_v2_{SIZE}",
            "global_batch": GLOBAL_BATCH,
            "scaling": rows}, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
