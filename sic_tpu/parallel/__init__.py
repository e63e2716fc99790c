"""Device-mesh sharding utilities (pjit / GSPMD).

TPU-native counterpart of the reference's distributed layer — NCCL DDP for
inference sharding and Lightning DDP for training
(reference: src/compress.py:33-55, 206-246; codec_sq_fixbpp.py:642-647).
There is no communication "backend" to port: shardings are declared on the
inputs, XLA inserts the collectives over ICI, and gradient all-reduce falls
out of jitting the train step on a sharded batch.

Axes:
- ``data``  — batch (image) parallelism, the DDP counterpart;
- ``tile``  — spatial parallelism over the 256-px tile grid: the image's W
  axis is sharded, GSPMD halo-exchanges the convs, and the folded
  ``(B*nH*nW)`` ViT tile-batch axis inherits the sharding.  This is the
  workload's natural "long-context" axis (SURVEY.md §2.6).
- ``model`` — Megatron-style tensor parallelism over the transformer weights
  (``tp_sharding``): qkv/up projections column-parallel, out/down
  projections row-parallel; composes with FSDP over ``data`` on a 3D mesh.
  (No ``expert`` axis: the model zoo has no MoE layers.)
- ``pipe`` — GPipe pipeline parallelism over homogeneous ViT trunks
  (``pipeline.spmd_pipeline``): per-layer params stacked and sharded by
  stage, microbatches ride a ``ppermute`` ring.
"""
from .mesh import (DEFAULT_TP_RULES, batch_sharding, fsdp_sharding,
                   image_sharding, make_mesh, pp_sharding, replicated,
                   shard_batch, shard_state, shard_state_fsdp, shard_state_pp,
                   shard_state_tp, tp_sharding)
from .pipeline import (codec_params_canonicalize, codec_params_stack,
                       pipeline_vit_trunk, spmd_pipeline, stack_hybrid_cells,
                       stack_trunk, unstack_hybrid_cells)

__all__ = ["DEFAULT_TP_RULES", "batch_sharding",
           "codec_params_canonicalize", "codec_params_stack", "fsdp_sharding",
           "image_sharding", "make_mesh", "pipeline_vit_trunk", "pp_sharding",
           "replicated", "shard_batch", "shard_state", "shard_state_fsdp",
           "shard_state_pp", "shard_state_tp", "spmd_pipeline",
           "stack_hybrid_cells", "stack_trunk", "tp_sharding",
           "unstack_hybrid_cells"]
