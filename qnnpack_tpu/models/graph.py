"""Graph builder/executor for quantized model assembly.

A thin layer-list IR (no autograd, no dynamic graph - inference only, like
the reference) that the model zoo builds against.  Tags:

    conv    quantized conv / depthwise / grouped (q8conv2d)
    gemm    1x1-conv / fully-connected (q8gemm path)
    maxpool / avgpool / gap
    add     residual add against a saved slot (add_quantize)
    save    stash the running value in a named slot
    concat  channel-concatenate saved slots (+ running value)
    split   split channels: head goes to a slot, tail keeps running
    shuffle channel shuffle (x8zip)
    softargmax

Models mirror the reference's benchmark tables (bench/convolution.cc:108-962).
All activations share a uniform synthetic quantization (scale 0.1, zp 128) so
adds/concats need no rescale - the same convention real quantized exports use
per-tensor params for; per-layer scales thread through the same spec fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..nn.conv import pack_conv_weights, q8conv2d, q8deconv2d
from ..nn.elementwise import (build_softargmax_lut, u8softargmax, x8lut,
                              x8zip)
from ..nn.gemm import q8gemm
from ..nn.packing import pack_gemm_weights
from ..nn.pool import q8avgpool2d, q8gavgpool, u8maxpool2d
from ..nn.requant_dispatch import make_requant_params
from ..quant.params import compute_add_quant_params, compute_avgpool_quant_params
from ..quant.requantize import add_quantize

ACT_SCALE = 0.1
ACT_ZP = 128
KERNEL_SCALE = 0.02
KERNEL_ZP = 128


@dataclasses.dataclass
class ConvSpec:
    kind: str  # "conv" | "gemm"
    strides: tuple
    padding: tuple
    groups: int
    rparams: Any


@dataclasses.dataclass
class GraphSpec:
    layers: list
    raw_weights: list
    meta: dict


class GraphBuilder:
    """Accumulates (layers, params) for graph_forward."""

    def __init__(self, rng: np.random.Generator, requant: str = "fp32"):
        self.rng = rng
        self.requant = requant
        self.layers = []
        self.params = []
        self.raw = []

    # -- weight synthesis -------------------------------------------------
    def _kernel(self, o, kh, kw, i):
        return self.rng.integers(0, 256, (o, kh, kw, i),
                                 dtype=np.int64).astype(np.uint8)

    def _bias(self, o):
        return self.rng.integers(-8000, 8000, (o,),
                                 dtype=np.int64).astype(np.int32)

    def _emit(self, tag, name, payload, packed=None, raw=None):
        self.layers.append((tag, name, payload))
        self.params.append(packed)
        self.raw.append(raw)

    def _rparams(self, act: str):
        """act: "relu6" | "relu" | "linear" -> requant clamp window."""
        omin, omax = 0, 255
        if act == "relu6":
            omax = min(255, ACT_ZP + int(round(6.0 / ACT_SCALE)))
            omin = ACT_ZP
        elif act == "relu":
            omin = ACT_ZP
        scale = ACT_SCALE * KERNEL_SCALE / ACT_SCALE
        return make_requant_params(self.requant, scale, ACT_ZP, omin, omax)

    # -- layers -----------------------------------------------------------
    def conv(self, name, cin, cout, kernel=(3, 3), strides=(1, 1),
             padding=((1, 1), (1, 1)), groups=1, act="relu6"):
        kh, kw = kernel
        rp = self._rparams(act)
        k = self._kernel(cout, kh, kw, cin // groups)
        b = self._bias(cout)
        if (kh, kw) == (1, 1) and strides == (1, 1) and groups == 1:
            packed = pack_gemm_weights(k.reshape(cout, cin), b, ACT_ZP,
                                       KERNEL_ZP)
            self._emit("gemm", name, ConvSpec("gemm", strides, padding, 1, rp),
                       packed, (k, b))
        else:
            packed = pack_conv_weights(k, b, ACT_ZP, KERNEL_ZP, groups)
            self._emit("conv", name,
                       ConvSpec("conv", strides, padding, groups, rp),
                       packed, (k, b))
        return cout

    def deconv(self, name, cin, cout, kernel=(2, 2), strides=(2, 2),
               padding=((0, 0), (0, 0)), adjustment=(0, 0), groups=1,
               act="relu"):
        kh, kw = kernel
        k = self._kernel(cout, kh, kw, cin // groups)
        b = self._bias(cout)
        packed = pack_conv_weights(k, b, ACT_ZP, KERNEL_ZP, groups,
                                   transposed=True)
        self._emit("deconv", name,
                   (ConvSpec("deconv", strides, padding, groups,
                             self._rparams(act)), adjustment), packed, (k, b))
        return cout

    def fc(self, name, cin, cout, act="linear"):
        k = self.rng.integers(0, 256, (cout, cin),
                              dtype=np.int64).astype(np.uint8)
        b = self._bias(cout)
        packed = pack_gemm_weights(k, b, ACT_ZP, KERNEL_ZP)
        self._emit("gemm", name,
                   ConvSpec("gemm", (1, 1), ((0, 0), (0, 0)), 1,
                            self._rparams(act)), packed, (k, b))
        return cout

    def maxpool(self, name, pool=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1))):
        self._emit("maxpool", name, (pool, strides, padding))

    def avgpool(self, name, pool, strides=None, padding=((0, 0), (0, 0))):
        ph, pw = pool
        qp = compute_avgpool_quant_params(
            -ACT_ZP * ph * pw, 1.0 / (ph * pw), ACT_ZP,
            input_zero_point=ACT_ZP)
        self._emit("avgpool", name,
                   (qp, pool, strides if strides else pool, padding))

    def gap(self, name, spatial):
        qp = compute_avgpool_quant_params(
            -ACT_ZP * spatial * spatial, 1.0 / (spatial * spatial), ACT_ZP,
            input_zero_point=ACT_ZP)
        self._emit("gap", name, qp)

    def save(self, slot):
        self._emit("save", f"save_{slot}", slot)

    def load(self, slot):
        """Resume the flow from a saved slot."""
        self._emit("load", f"load_{slot}", slot)

    def add(self, name, slot):
        self._emit("add", name,
                   (slot, compute_add_quant_params(ACT_ZP, ACT_ZP, ACT_ZP,
                                                   1.0, 1.0)))

    def concat(self, name, slots):
        """Concatenate saved slots (in order) along channels."""
        self._emit("concat", name, tuple(slots))

    def split(self, name, slot, channels):
        """First `channels` channels -> slot; rest keeps flowing."""
        self._emit("split", name, (slot, channels))

    def shuffle(self, name, groups):
        self._emit("shuffle", name, groups)

    def softargmax(self, name, channels, input_scale=ACT_SCALE):
        self._emit("softargmax", name,
                   jnp.asarray(build_softargmax_lut(input_scale, channels)))

    def finish(self, **meta):
        spec = GraphSpec(layers=self.layers, raw_weights=self.raw, meta=meta)
        return self.params, spec


def graph_forward(params, spec: GraphSpec, x_u8):
    """Execute a GraphSpec: pure function of (params pytree, static spec).

    One graph-level peephole: `concat` of g equal-width slots immediately
    followed by `shuffle(g)` IS a channel interleave of the slots, emitted
    as a single stack+reshape instead of two data-movement ops - measured
    1.19x on shufflenet_v2_x1 b128 e2e, bit-exact (the v2 unit tail is
    exactly this pattern; PROFILE_shufflenet_v2_x1_b128.md shows
    shuffle+concat at 45% of the isolated layer sum)."""
    x = x_u8
    env = {}
    layers = spec.layers
    i = 0
    while i < len(layers):
        (tag, name, payload), p = layers[i], params[i]
        if (tag == "concat" and i + 1 < len(layers)
                and layers[i + 1][0] == "shuffle"
                and layers[i + 1][2] == len(payload)
                and len({env[s].shape[-1] for s in payload}) == 1):
            parts = [env[s] for s in payload]
            x = jnp.stack(parts, axis=-1).reshape(
                parts[0].shape[:-1]
                + (len(parts) * parts[0].shape[-1],))
            i += 2
            continue
        x = _graph_layer(tag, payload, p, x, env)
        i += 1
    return x


def _graph_layer(tag, payload, p, x, env):
    if tag == "save":
        env[payload] = x
    elif tag == "load":
        x = env[payload]
    elif tag == "add":
        slot, qp = payload
        x = add_quantize(x, env[slot], qp)
    elif tag == "concat":
        x = jnp.concatenate([env[s] for s in payload], axis=-1)
    elif tag == "split":
        slot, c = payload
        env[slot] = x[..., :c]
        x = x[..., c:]
    elif tag == "shuffle":
        x = x8zip(x, payload)
    elif tag == "maxpool":
        pool, strides, padding = payload
        x = u8maxpool2d(x, pool, strides, padding)
    elif tag == "avgpool":
        qp, pool, strides, padding = payload
        x = q8avgpool2d(x, qp, pool, strides, padding)
    elif tag == "gap":
        b, h, w, c = x.shape
        x = q8gavgpool(x.reshape(b, h * w, c), payload, axis=1)
    elif tag == "gemm":
        # Contract C in place at natural rank (see nn/gemm.q8gemm_acc:
        # the 2D collapse costs a relayout copy).
        x = q8gemm(x, p, payload.rparams)
    elif tag == "conv":
        x = q8conv2d(x, p, payload.rparams, payload.strides,
                     payload.padding)
    elif tag == "deconv":
        cs, adjustment = payload
        x = q8deconv2d(x, p, cs.rparams, cs.strides, cs.padding,
                       adjustment)
    elif tag == "flatten":
        x = x.reshape(x.shape[0], -1)
    elif tag == "pad":
        # Spatial constant-pad with the tensor's zero point (TFLite PAD
        # on quantized tensors; the zero-buffer analogue).
        (pt, pb), (pl_, pr), zp = payload
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=np.uint8(zp))
    elif tag == "lut":
        # Per-element byte map (x8lut): QUANTIZE rescales, sigmoid, ...
        # Routed through the one-hot dot lowering (nn/elementwise
        # ._lut256, 15.6x over jnp.take's serialized gather on v5e,
        # BENCH_MODELS.json bert note) - this tag previously still used
        # the retired jnp.take path.
        x = x8lut(x, payload)
    elif tag == "softargmax":
        x = u8softargmax(x, payload)
    else:
        raise ValueError(f"unknown tag {tag!r}")
    return x
