"""Multi-chip scale-out: shard the vector store across a TPU mesh.

The reference scales by full replication (every node builds every index,
SURVEY §2.4); the TPU-native extra axis is sharding one index's arrays
across chips when a single HBM is insufficient: vector rows shard over the
'model' mesh axis, the query batch shards over 'data', each chip computes
its local top-k, and one all-gather over ICI merges candidates — the only
collective the workload needs.
"""

from vector_store_tpu.parallel.sharded import (
    ShardedFlatIndex,
    make_mesh,
    sharded_search_step,
    sharded_upsert_step,
)

__all__ = [
    "ShardedFlatIndex",
    "make_mesh",
    "sharded_search_step",
    "sharded_upsert_step",
]
