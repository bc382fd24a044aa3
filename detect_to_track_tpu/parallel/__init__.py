"""multi-chip scaling via jax.sharding (the reference is single-process,
single-GPU -- SURVEY.md §2 #26; this layer is what the TPU build adds)."""

from .mesh import (
    barrier_sync,
    local_value,
    make_mesh,
    make_parallel_detect,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
