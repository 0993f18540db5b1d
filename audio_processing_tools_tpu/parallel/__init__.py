"""Multi-chip scaling: device mesh, sharded batch step, corpus aggregation.

The reference's only "distributed" machinery is process pools + S3/Postgres
(SURVEY §2.3).  Here the file axis is a ``jax.sharding.Mesh`` axis: per-core
clip batches, XLA collectives over ICI for corpus aggregates, DCN only for
work-list scatter and host sinks.
"""

from audio_processing_tools_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    local_rows,
    ShardedRainPipeline,
)

__all__ = ["make_mesh", "shard_batch", "local_rows", "ShardedRainPipeline"]
