"""Expert-parallel analogue: grouped convolution sharded over groups.

The reference has no MoE; its structural analogue is grouped convolution
(the `groups` dim, src/convolution.c:50, used by the ShuffleNet family),
where each group is an independent "expert" touching a disjoint channel
slice (SURVEY.md 2.2).  Sharding the group dimension over a mesh axis needs
NO collectives in the compute path - inputs, weights, and outputs all split
along channels - which is exactly why it is the cheapest parallel axis when
the model has groups.

Implementation: `jax.shard_map` with channel-sharded input/weights/output;
each shard runs the ordinary quantized conv on its groups.  Bit-identical to
the unsharded operator (disjoint slices, no resummation).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..nn.conv import PackedConvWeights, q8conv2d


def grouped_conv2d_ep(x_u8, packed: PackedConvWeights, rparams, mesh: Mesh,
                      axis: str = "model", strides=(1, 1),
                      padding=((0, 0), (0, 0)), dilation=(1, 1)):
    """Grouped quantized conv with groups sharded over `mesh[axis]`.

    x: NHWC with C = groups * group_input_channels, sharded on C;
    output NHWC sharded on C (= groups * group_output_channels).
    Requires groups % mesh.shape[axis] == 0.
    """
    n = mesh.shape[axis]
    if packed.groups % n != 0:
        raise ValueError(f"groups={packed.groups} must divide over "
                         f"{n} shards")
    local_groups = packed.groups // n

    def local(x_l, w_l, bias_l):
        local_packed = dataclasses.replace(
            packed, w=w_l, bias_folded=bias_l, groups=local_groups)
        return q8conv2d(x_l, local_packed, rparams, strides=strides,
                        padding=padding, dilation=dilation)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, axis),      # x channels
                  P(None, None, None, axis),      # w HWIO output channels
                  P(axis)),                       # folded bias
        out_specs=P(None, None, None, axis))
    return fn(x_u8, packed.w, packed.bias_folded)
