"""Low-noise device-time measurement for benchmarks.

Replaces the round-1/2 two-point slope method, which differenced two noisy
wall-clock measurements and could return negative marginal time when the
per-dispatch jitter (tens of ms through the axon tunnel in this
environment) was comparable to the quantity being measured.  This is the
GOPS-accounting discipline of the reference's benchmark harness
(/root/reference/bench/q8gemm.cc:108 counts items actually processed per
timed iteration) applied to a remote-dispatch setting:

1. The per-call dispatch overhead is measured DIRECTLY, once, with a
   trivial jitted program (median + spread of 15 calls) - used to size the
   noise floor, not subtracted from workload timings.
2. The workload runs inside jitted ``lax.scan`` loops of N and 2N
   iterations; per-iteration time = (median t(2N) - median t(N)) / N.
   Differencing two loop lengths cancels the dispatch overhead AND the
   ~25 ms fixed per-execution cost of scan programs on the axon backend
   (see measure_loop docstring).  N is sized so the DIFFERENCE is >=
   max(min_seconds, 50x the observed dispatch spread), growing
   adaptively if the first estimate was too high; N is rounded to a power
   of two so repeated runs reuse the compilation cache.
3. The marginal time is asserted positive, and the relative spread of the
   interleaved K-run samples is reported alongside every value so
   downstream consumers (BENCH rows, dispatch thresholds, docstring
   claims) carry their own error bars.

The loop body XORs the input with (i & 3) to defeat loop-invariant
hoisting, and consumes the full output either by chaining it into the next
iteration's input (``chain=True``, zero overhead, requires matching
shape/dtype) or by an int32 full-reduction into the carry (a full sum
cannot be slice-pushed through the op, unlike a [0, 0] element probe).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import statistics
import time

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Measurement:
    seconds: float          # device time per iteration (two-point method)
    dispersion: float       # summed (max-min) spread of both loops / delta
    n_iters: int            # shorter loop length n (the other loop is 2n)
    samples: tuple          # differenced per-iteration samples (t2n_k - tn_k)/n

    def rate(self, items_per_iter: float) -> float:
        return items_per_iter / self.seconds


@functools.cache
def dispatch_overhead() -> tuple:
    """(median, p90-p10 spread) of a trivial jitted call, in seconds."""
    x = jnp.zeros((8, 128), jnp.uint8)
    f = jax.jit(lambda v: v + jnp.uint8(1))
    f(x).block_until_ready()
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[7], ts[13] - ts[1]


def _perturb(x, i):
    """Vary the input per loop iteration (defeats loop-invariant hoisting)
    without changing its magnitude distribution: XOR with (i & 3) for
    integer dtypes, add a tiny multiple of i for floats.  `x` may be any
    pytree of arrays (multi-input ops pass a tuple and unpack in `fn`)."""
    def one(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            return leaf ^ (i & 3).astype(leaf.dtype)
        return leaf + (i & 3).astype(leaf.dtype) * jnp.asarray(1e-6, leaf.dtype)
    return jax.tree.map(one, x)


def _make_loop(fn, n: int, chain: bool):
    # lax.scan, NOT lax.fori_loop: on the axon remote backend,
    # block_until_ready does not wait for programs whose compute is
    # elementwise-only (measured 2026-08-21: a 16384-iteration fori_loop
    # over a 256 MB uint8 buffer "completed" in 30 us, i.e. 68 TB/s, and a
    # single 64 MB elementwise dispatch in 60 us; force-consuming the
    # deferred result then stalled the device for minutes).  The same
    # bodies under lax.scan block correctly (26.7 ms for 64 x 64 MB
    # passes = a plausible 320 GB/s), as do matmul-containing fori_loops,
    # so scan is used for both loop shapes.  See BENCH_NOTES.md.
    idx = jnp.arange(n)
    if chain:
        @jax.jit
        def loop(x0):
            def body(v, i):
                return fn(_perturb(v, i)), ()
            return jax.lax.scan(body, x0, idx)[0]
    else:
        @jax.jit
        def loop(x0):
            def body(s, i):
                y = fn(_perturb(x0, i))
                # optimization_barrier forces y to MATERIALIZE before the
                # consuming reduction: without it XLA fuses the sum into
                # the op's epilogue and the output never hits HBM, which
                # inflated isolated rates of write-dominated ops past
                # 100% of the HBM roofline (harness fix #4,
                # BENCH_NOTES.md; e.g. a 1x1 gemm on [128,64,64,64]
                # measured 0.045 ms vs its 0.064 ms write-inclusive
                # bound).  chain=True bodies already write (the output IS
                # the next input).
                y = jax.lax.optimization_barrier(y)
                tot = sum((jnp.sum(leaf).astype(jnp.float32)
                           for leaf in jax.tree.leaves(y)), jnp.float32(0))
                return s + tot, ()
            return jax.lax.scan(body, jnp.float32(0), idx)[0]
    return loop


def _timed(loop, x) -> float:
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    return time.perf_counter() - t0


def measure_loop(fn, x, *, chain: bool = False, min_seconds: float = 0.3,
                 repeats: int = 5, max_iters: int = 1 << 17,
                 min_iters: int = 4,
                 est_seconds: float | None = None) -> Measurement:
    """Measure per-iteration device time of ``fn(x)``; see module doc.

    Two-point method at LARGE n: per-iteration time is
    ``(t(2n) - t(n)) / n`` with each total the median of ``repeats`` runs.
    Differencing two loop timings cancels BOTH the per-dispatch overhead
    AND the ~25 ms fixed per-execution cost of scan-containing programs on
    the axon backend (measured 2026-08-21, constant from n=32 to n=8192;
    subtracting only the trivial-program dispatch overhead inflated every
    small-n measurement by fixed_cost/n - e.g. an isolated b128 FC layer
    read 0.78 ms/iter at n=32 vs its true ~9 us).  This is the round-1/2
    slope method made sound: n is sized so the DIFFERENCE t(2n)-t(n) is >=
    max(min_seconds, 50x the observed run-to-run jitter), which is the
    condition the r1/r2 harness violated.

    ``est_seconds``: optional caller estimate of the per-iteration time,
    used to size n without a calibration step (a 2x-off estimate only
    moves n one power of two)."""
    t_disp, spread = dispatch_overhead()
    target = max(min_seconds, 50.0 * spread)

    def build(n):
        loop = _make_loop(fn, n, chain)
        loop(x).block_until_ready()  # compile + warmup
        return loop

    if est_seconds is not None:
        est = max(est_seconds, 1e-9)
    else:
        # Calibrate: difference two small loops (cancels the fixed cost).
        n_cal = 256
        c1, c2 = build(n_cal), build(2 * n_cal)
        t1 = min(_timed(c1, x) for _ in range(2))
        t2 = min(_timed(c2, x) for _ in range(2))
        est = max((t2 - t1) / n_cal, 1e-9)

    for _ in range(4):
        n = 1 << max(math.ceil(math.log2(target / est)), 2)
        n = max(min(n, max_iters), min_iters)
        lo, hi = build(n), build(2 * n)
        # Interleave to decorrelate drift between the two loop lengths.
        ts_lo, ts_hi = [], []
        for _ in range(repeats):
            ts_lo.append(_timed(lo, x))
            ts_hi.append(_timed(hi, x))
        med_lo = statistics.median(ts_lo)
        med_hi = statistics.median(ts_hi)
        delta = med_hi - med_lo
        jitter = ((max(ts_lo) - min(ts_lo)) + (max(ts_hi) - min(ts_hi))) / 2
        # Accept when the difference clears the sizing target, or - early
        # accept - when it clears BOTH 10x the observed run-to-run jitter
        # AND 50x the measured dispatch spread (the floor ties to dispatch
        # spread so a coincidentally tiny 5-run jitter cannot admit a
        # delta far below the documented sizing guarantee).
        floor = min(target, max(50.0 * spread, 10 * jitter))
        if n >= max_iters or (delta > 0 and delta >= floor):
            break
        # Signal too small vs noise: the estimate was too high; re-estimate
        # from this pair and try a longer loop.
        est = max(delta / n, est / 8, 1e-9)

    if delta <= 0:
        raise RuntimeError(
            f"non-positive marginal time {delta:.3e}s between n={n} and "
            f"n={2*n}; dispatch/fixed overhead dominates - raise min_seconds "
            f"or max_iters")
    seconds = delta / n
    # Dispersion: relative spread of the differenced samples.
    dispersion = ((max(ts_hi) - min(ts_hi)) + (max(ts_lo) - min(ts_lo))) / delta
    # Samples are the k-th interleaved DIFFERENCED pair (t(2n)_k - t(n)_k)/n
    # - consistent with `seconds` (whose value is the median-of-medians
    # version of the same quantity); raw loop timings would embed the scan
    # fixed cost and the dispatch overhead.
    return Measurement(seconds=seconds, dispersion=dispersion, n_iters=n,
                       samples=tuple((h - l) / n for h, l in zip(ts_hi, ts_lo)))
