"""Mesh/collectives scaling layer (SURVEY.md sections 2.2, 5.8).

Parallelism axes provided (the reference's only axis is intra-op CPU
threading via pthreadpool; everything here is new TPU capability):

  DP  mesh.py      batch sharding over the "data" axis
  TP  mesh.py      (a) output-channel weight sharding (collective-free
                   compute path); (b) K-dim/input-channel sharding with
                   int32 psum before requantization (gemm_kdim_tp,
                   conv_ic_tp)
  SP  halo.py      spatial H sharding with ppermute halo exchange
                   (the sequence/context-parallel analogue)
  PP  pipeline.py  stage-partitioned microbatch pipeline over ppermute
  EP  expert.py    grouped-conv group sharding (the expert-parallel
                   analogue; collective-free)
  MH  multihost.py DCN x ICI hybrid meshes, jax.distributed lifecycle,
                   per-host input feeding, slice-restart recovery
"""

from .expert import grouped_conv2d_ep  # noqa: F401
from .halo import spatial_conv2d  # noqa: F401
from .mesh import (  # noqa: F401
    batch_sharding, conv_ic_tp, gemm_kdim_tp, make_mesh, shard_params,
    sharded_inference_fn,
)
from .multihost import (  # noqa: F401
    SliceRecovery, distributed_init, distributed_shutdown,
    host_local_batch_to_global, make_hybrid_mesh,
)
from .pipeline import pipeline_apply, stack_stage_params  # noqa: F401
