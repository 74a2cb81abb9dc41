"""Profiling: device traces + per-op analytical cost counters.

The reference has no in-library profiling; its perf story is external
google-benchmark GOPS counters (bench/q8gemm.cc:108 `SetItemsProcessed`) and
Caffe2 speed_benchmark (SURVEY.md section 5.1).  Here both roles are
in-framework: `trace()` wraps jax.profiler for device timelines, and
`graph_cost()` computes analytic MAC/byte counts per layer of a GraphSpec -
the roofline denominators the bench driver reports against.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qnnpack_tpu_trace"):
    """Capture a device profile viewable with tensorboard/xprof."""
    with jax.profiler.trace(log_dir):
        yield log_dir


@dataclasses.dataclass
class OpCost:
    name: str
    macs: int  # multiply-accumulates
    bytes_accessed: int

    @property
    def flops(self) -> int:
        return 2 * self.macs


def _conv_out(size, k, pad, stride, dilation=1):
    eff = (k - 1) * dilation + 1
    return (size + pad[0] + pad[1] - eff) // stride + 1


def graph_cost(spec, input_shape) -> list[OpCost]:
    """Per-layer MACs/bytes for a models.graph.GraphSpec forward at
    `input_shape` (NHWC uint8)."""
    costs = []
    b, h, w, c = input_shape
    env = {}
    for (tag, name, payload), raw in zip(spec.layers, spec.raw_weights):
        if tag == "save":
            env[payload] = (h, w, c)
        elif tag == "load":
            h, w, c = env[payload]
        elif tag == "split":
            slot, ch = payload
            env[slot] = (h, w, ch)
            c = c - ch
        elif tag == "concat":
            c = sum(env[s][2] for s in payload)
            h, w, _ = env[payload[0]]
            # Zero traffic in the LOWER BOUND: XLA elides concatenation by
            # buffer assignment (producers write directly into slices of
            # the joint buffer).  Measured evidence: counting concat at
            # read+write pushes squeezenet_v10/v11 b128 to 107/115% of the
            # HBM capability - impossible - so the traffic does not occur
            # (round-5 cost-model audit; see BENCH_MODELS.json
            # notes.cost_model).
        elif tag in ("conv", "deconv"):
            cs = payload[0] if tag == "deconv" else payload
            kernel, bias = raw
            if kernel.ndim == 2:  # FC stored as [O, K] (mobilenet_v2 head)
                o, kh, kw, icpg = kernel.shape[0], 1, 1, kernel.shape[1]
            else:
                o, kh, kw, icpg = kernel.shape
            if tag == "deconv":
                ho = cs.strides[0] * (h - 1) + kh - sum(cs.padding[0])
                wo = cs.strides[1] * (w - 1) + kw - sum(cs.padding[1])
            else:
                ho = _conv_out(h, kh, cs.padding[0], cs.strides[0])
                wo = _conv_out(w, kw, cs.padding[1], cs.strides[1])
            macs = b * ho * wo * o * kh * kw * icpg
            bytes_ = (b * h * w * c) + kernel.size + (b * ho * wo * o)
            costs.append(OpCost(name, macs, bytes_))
            h, w, c = ho, wo, o
        elif tag == "gemm":
            kernel, bias = raw
            o = kernel.shape[0]
            m = b * h * w if c else b
            macs = m * o * kernel.size // o
            costs.append(OpCost(name, macs, m * kernel.size // o + kernel.size
                                + m * o))
            c = o
        elif tag == "maxpool":
            pool, strides, padding = payload
            hi, wi = h, w
            h = _conv_out(h, pool[0], padding[0], strides[0])
            w = _conv_out(w, pool[1], padding[1], strides[1])
            # Read the full INPUT plus write the output: a stride-2 3x3
            # pool reads ~4x its output, so the old 2*output count
            # understated pool traffic ~2.5x (round-4 cost-model audit).
            costs.append(OpCost(name, 0, b * hi * wi * c + b * h * w * c))
        elif tag == "avgpool":
            qp, pool, strides, padding = payload
            hi, wi = h, w
            h = _conv_out(h, pool[0], padding[0], strides[0])
            w = _conv_out(w, pool[1], padding[1], strides[1])
            costs.append(OpCost(name, 0, b * hi * wi * c + b * h * w * c))
        elif tag == "gap":
            costs.append(OpCost(name, 0, b * h * w * c + b * c))
            h = w = 1
        elif tag in ("add", "softargmax"):
            # add: two inputs + one output - 3 REAL buffer passes.
            # Measured evidence that adds do NOT fuse into the adjacent
            # convs on this backend: resnet50 b128 (add-heavy, 2.1 GB of
            # its 5.1 GB model traffic is adds) lands at 99.9-101% of
            # exactly this 3-buffer accounting (BENCH_MODELS.json).
            costs.append(OpCost(name, 0, 3 * b * h * w * c))
        elif tag == "shuffle":
            # Zero traffic in the LOWER BOUND: the channel shuffle is a
            # static permutation (reshape-transpose-reshape) that XLA folds
            # into the neighboring dot/conv operand indexing.  Measured
            # evidence: ANY nonzero per-shuffle accounting pushes
            # shufflenet_v1_g1 b128 above 100% of the HBM capability (the
            # old 3-buffer count read 105.7%, VERDICT r4 weak #2; 2-buffer
            # still reads 107%), while the zero count lands the row at
            # 98.7% - consistent with an elided op.
            pass
        elif tag == "flatten":
            c, h, w = h * w * c, 1, 1
    return costs


def total_cost(spec, input_shape) -> OpCost:
    per_op = graph_cost(spec, input_shape)
    return OpCost("total", sum(o.macs for o in per_op),
                  sum(o.bytes_accessed for o in per_op))
