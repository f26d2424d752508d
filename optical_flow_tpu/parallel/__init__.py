from optical_flow_tpu.parallel.mesh import (
    make_mesh,
    shard_pairs,
    sharded_flow_step,
    sharded_extract_step,
)
from optical_flow_tpu.parallel.corpus import shard_videoids

__all__ = [
    "make_mesh",
    "shard_pairs",
    "sharded_flow_step",
    "sharded_extract_step",
    "shard_videoids",
]
