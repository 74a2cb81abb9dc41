"""Model zoo tests: a tiny graph exercising every IR tag is pinned bit-exact
against an independent numpy executor; q8bmm (dynamic matmul) and a small
BERT encoder get their own numpy parity; full-size zoo models are
shape-checked."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qnnpack_tpu import models
from qnnpack_tpu.models.graph import (ACT_ZP, KERNEL_ZP, GraphBuilder,
                                      graph_forward)
from qnnpack_tpu.nn.gemm import q8bmm
from qnnpack_tpu.nn.requant_dispatch import make_requant_params
from qnnpack_tpu.quant import oracles

import reference_ops as ref

RNG = np.random.default_rng(0x300)


def numpy_graph_forward(spec, x):
    """Independent numpy execution of a GraphSpec (q31 requant only)."""
    env = {}
    for (tag, name, payload), raw in zip(spec.layers, spec.raw_weights):
        if tag == "save":
            env[payload] = x
        elif tag == "load":
            x = env[payload]
        elif tag == "add":
            slot, qp = payload
            x = oracles.oracle_add(x, env[slot], qp)
        elif tag == "concat":
            x = np.concatenate([env[s] for s in payload], axis=-1)
        elif tag == "split":
            slot, c = payload
            env[slot] = x[..., :c]
            x = x[..., c:]
        elif tag == "shuffle":
            lead = x.shape[:-1]
            c = x.shape[-1]
            k = c // payload
            x = x.reshape(*lead, payload, k).swapaxes(-1, -2).reshape(*lead, c)
        elif tag == "maxpool":
            pool, strides, padding = payload
            x = ref.maxpool2d(x, pool, strides, padding)
        elif tag == "avgpool":
            qp, pool, strides, padding = payload
            acc = ref.avgpool2d_acc(x, ACT_ZP, pool, strides, padding)
            x = oracles.oracle_avgpool(acc, qp)
        elif tag == "gap":
            b, h, w, c = x.shape
            acc = (x.reshape(b, h * w, c).astype(np.int32) - ACT_ZP).sum(axis=1)
            x = oracles.oracle_avgpool(acc, payload)
        elif tag == "gemm":
            kernel, bias = raw
            cout = kernel.shape[0]
            lead = x.shape[:-1]
            acc = (x.reshape(-1, x.shape[-1]).astype(np.int32) - ACT_ZP) @ \
                (kernel.reshape(cout, -1).astype(np.int32) - KERNEL_ZP).T \
                + bias[None, :]
            x = oracles.oracle_q31(acc, payload.rparams).reshape(*lead, cout)
        elif tag == "conv":
            kernel, bias = raw
            acc = ref.conv2d_acc(x, kernel, bias, ACT_ZP, KERNEL_ZP,
                                 payload.strides, payload.padding, (1, 1),
                                 payload.groups)
            x = oracles.oracle_q31(acc, payload.rparams)
        elif tag == "deconv":
            cs, adjustment = payload
            kernel, bias = raw
            acc = ref.deconv2d_acc(x, kernel, bias, ACT_ZP, KERNEL_ZP,
                                   cs.strides, cs.padding, adjustment, (1, 1),
                                   cs.groups)
            x = oracles.oracle_q31(acc, cs.rparams)
        elif tag == "flatten":
            x = x.reshape(x.shape[0], -1)
        else:
            raise ValueError(tag)
    return x


def test_all_tags_bit_exact():
    """One graph touching every IR construct, verified bit-exact."""
    rng = np.random.default_rng(7)
    g = GraphBuilder(rng, requant="q31")
    c = g.conv("stem", 3, 8, strides=(2, 2), padding=((0, 1), (0, 1)))
    g.maxpool("mp", (3, 3), (2, 2), ((1, 1), (1, 1)))
    g.save("a")
    c = g.conv("c1", c, 8, act="relu")
    g.add("res", "a")
    g.split("sp", "left", 4)
    c = g.conv("right", 4, 12, kernel=(1, 1), padding=((0, 0), (0, 0)))
    g.save("r")
    g.concat("cat", ["left", "r"])
    g.shuffle("shuf", 4)
    c = g.conv("grouped", 16, 16, groups=4)
    c = g.conv("dw", c, c, groups=c)
    g.avgpool("ap", (2, 2), (2, 2))
    c = g.deconv("up", c, 8, kernel=(2, 2), strides=(2, 2))
    g.gap("gap", 4)
    g.fc("fc", c, 10)
    params, spec = g.finish(name="alltags")

    x = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.int64).astype(np.uint8)
    want = numpy_graph_forward(spec, x)
    got = np.asarray(jax.jit(
        lambda p, v: graph_forward(p, spec, v))(params, jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


class TestQ8Bmm:
    @pytest.mark.parametrize("za,zb", [(128, 128), (0, 121), (121, 0),
                                       (255, 1), (0, 0)])
    def test_bit_exact(self, za, zb):
        a = RNG.integers(0, 256, (2, 3, 8, 16), dtype=np.int64).astype(np.uint8)
        b = RNG.integers(0, 256, (2, 3, 16, 12), dtype=np.int64).astype(np.uint8)
        acc = np.einsum("bhmk,bhkn->bhmn",
                        a.astype(np.int64) - za, b.astype(np.int64) - zb)
        assert acc.min() >= -2**31 and acc.max() < 2**31
        rp = make_requant_params("q31", 0.005, 128)
        got = np.asarray(q8bmm(jnp.asarray(a), jnp.asarray(b), za, zb, rp))
        np.testing.assert_array_equal(
            got, oracles.oracle_q31(acc.astype(np.int32), rp))


ZOO = [
    ("mobilenet_v1", lambda r: models.mobilenet_v1(r), (1, 224, 224, 3), (1, 1000)),
    ("squeezenet_v11", lambda r: models.squeezenet_v11(r), (1, 224, 224, 3), (1, 1000)),
    ("resnet18", lambda r: models.resnet18(r), (1, 224, 224, 3), (1, 1000)),
    ("resnet50", lambda r: models.resnet50(r), (1, 224, 224, 3), (1, 1000)),
    ("shufflenet_v1_g3", lambda r: models.shufflenet_v1(r, groups=3), (1, 224, 224, 3), (1, 1000)),
    ("shufflenet_v2_x1", lambda r: models.shufflenet_v2(r, width=1.0), (1, 224, 224, 3), (1, 1000)),
    ("vgg16", lambda r: models.vgg16(r), (1, 224, 224, 3), (1, 1000)),
    ("enet_seg", lambda r: models.enet_seg(r, input_size=128), (1, 128, 128, 3), (1, 128, 128, 12)),
]


@pytest.mark.parametrize("name,build,in_shape,out_shape", ZOO,
                         ids=[z[0] for z in ZOO])
def test_zoo_shapes(name, build, in_shape, out_shape):
    rng = np.random.default_rng(1)
    params, spec = build(rng)
    x = jnp.asarray(rng.integers(0, 256, in_shape,
                                 dtype=np.int64).astype(np.uint8))
    y = jax.jit(lambda p, v: graph_forward(p, spec, v))(params, x)
    assert y.shape == out_shape and y.dtype == jnp.uint8


def numpy_bert_forward(params, spec, x):
    """Independent numpy BERT encoder (mirrors bert_encoder_forward)."""
    from qnnpack_tpu.models.bert import ACT_ZP as BZP, KERNEL_ZP as BKZP
    cfg = spec["cfg"]
    b, s, h = x.shape
    nh, dh = cfg.heads, cfg.head_dim

    def gemm(x2d, packed, rp):
        # Recover original weights from the packed record.
        w = (np.asarray(packed.w).astype(np.int32) + 128).T  # [N, K] uint8 vals
        za, zw = packed.input_zero_point, packed.kernel_zero_point
        col = (w - zw)
        bias = np.asarray(packed.bias_folded) \
            + (za - 128) * np.asarray(packed.w).astype(np.int32).sum(axis=0) \
            - packed.k * (za - 128) * (zw - 128)
        acc = (x2d.astype(np.int32) - za) @ col.T + bias[None, :]
        return oracles.oracle_fp32(acc, rp) if rp.__class__.__name__ == "FP32Params" \
            else oracles.oracle_q31(acc, rp)

    def bmm(a, bb, za, zb, rp):
        acc = np.einsum("...mk,...kn->...mn", a.astype(np.int64) - za,
                        bb.astype(np.int64) - zb).astype(np.int32)
        return oracles.oracle_fp32(acc, rp) if rp.__class__.__name__ == "FP32Params" \
            else oracles.oracle_q31(acc, rp)

    lut = np.asarray(spec["softargmax_lut"])
    for layer in params:
        resid = x
        qkv = gemm(x.reshape(b * s, h), layer["qkv"], spec["rp_proj"])
        qkv = qkv.reshape(b, s, 3, nh, dh)
        q = np.transpose(qkv[:, :, 0], (0, 2, 1, 3))
        k = np.transpose(qkv[:, :, 1], (0, 2, 3, 1))
        v = np.transpose(qkv[:, :, 2], (0, 2, 1, 3))
        scores = bmm(q, k, BZP, BZP, spec["rp_scores"])
        probs = ref.softargmax(scores.reshape(-1, s), lut).reshape(scores.shape)
        ctx = bmm(probs, v, 0, BZP, spec["rp_ctx"])
        ctx = np.transpose(ctx, (0, 2, 1, 3)).reshape(b * s, h)
        attn = gemm(ctx, layer["out"], spec["rp_proj"]).reshape(b, s, h)
        x = oracles.oracle_add(attn, resid, spec["add"])
        resid2 = x
        y = gemm(x.reshape(b * s, h), layer["ffn1"], spec["rp_relu"])
        y = gemm(y, layer["ffn2"], spec["rp_proj"]).reshape(b, s, h)
        x = oracles.oracle_add(y, resid2, spec["add"])
    return x


def test_bert_tiny_bit_exact():
    rng = np.random.default_rng(5)
    cfg = models.BertConfig(hidden=32, heads=2, ffn=64, seq_len=16, layers=2,
                            requant="q31")
    params, spec = models.build_bert_encoder(rng, cfg)
    x = rng.integers(0, 256, (2, 16, 32), dtype=np.int64).astype(np.uint8)
    want = numpy_bert_forward(params, spec, x)
    got = np.asarray(jax.jit(
        lambda p, v: models.bert_encoder_forward(p, spec, v))(
            params, jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)
