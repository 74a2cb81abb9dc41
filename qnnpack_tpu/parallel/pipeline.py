"""Pipeline parallelism: stage-partitioned execution with microbatching.

The reference never spans devices (SURVEY.md 2.2); this module provides the
PP axis of the TPU build for deep stacks of shape-uniform blocks (the int8
BERT encoder is the flagship user; CNN backbones prefer DP/TP/spatial).

Design: `jax.shard_map` over a mesh axis; every device holds the packed
parameters of one stage (stacked pytree, leading dim = stage, sharded over
the axis).  A `lax.fori_loop` runs n_micro + n_stages - 1 ticks; each tick
every stage applies its block to its current buffer and `lax.ppermute`
shifts activations one stage down the chain (a neighbor ICI transfer, the
collective-based replacement for the reference's fork-join handoff).  The
schedule is the classic inference fill-drain pipeline: bubble overhead
(n_stages - 1) / (n_micro + n_stages - 1).

Integer activations move losslessly between stages, so a pipelined int8
model is bit-identical to its single-chip execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_stage_params):
    """Stack a list of identically-shaped stage pytrees along a new leading
    stage axis (shard this axis over the pipeline mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(stage_fn, stacked_params, x_micro, mesh: Mesh,
                   axis: str = "model"):
    """Run microbatches through a chain of shape-uniform stages.

    stage_fn:       (stage_params, x) -> y with y.shape == x.shape
    stacked_params: pytree with leading stage dim == mesh.shape[axis]
    x_micro:        [n_micro, microbatch, ...] input microbatches
    Returns [n_micro, microbatch, ...] outputs (order preserved).
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    n_steps = n_micro + n_stages - 1
    shift_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def local(params_stage, x_all):
        # params arrive with a leading stage dim of 1; drop it.
        params = jax.tree.map(lambda p: p[0], params_stage)
        s = lax.axis_index(axis)
        # Mark the carry as device-varying over the pipeline axis up front;
        # the loop body makes it varying anyway (axis_index, ppermute) and
        # shard_map requires carry in/out types to agree.
        buf = lax.pcast(jnp.zeros_like(x_all[0]), (axis,), to="varying")
        outputs = lax.pcast(jnp.zeros_like(x_all), (axis,), to="varying")

        def body(t, carry):
            buf, outputs = carry
            # Stage 0 ingests microbatch t (clamped; extra ticks are drain).
            feed = x_all[jnp.minimum(t, n_micro - 1)]
            x_in = jnp.where(s == 0, feed, buf)
            y = stage_fn(params, x_in)
            # Last stage emits microbatch k = t - (n_stages - 1).
            k = t - (n_stages - 1)
            upd = lax.dynamic_update_index_in_dim(
                outputs, y, jnp.maximum(k, 0), axis=0)
            outputs = jnp.where((s == n_stages - 1) & (k >= 0), upd, outputs)
            # Shift activations one stage down the chain.
            buf = lax.ppermute(y, axis, perm=shift_perm)
            return buf, outputs

        _, outputs = lax.fori_loop(0, n_steps, body, (buf, outputs))
        return outputs[None]  # leading stage dim for out_specs

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis))
    # Every stage returns an outputs buffer; only the last stage's is real.
    return fn(stacked_params, x_micro)[-1]
