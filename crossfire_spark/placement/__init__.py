"""Crossfire domain layer: HDFS block-placement analytics re-expressed
as Spark DataFrame logic over topology metadata tables.

The reference implements these as imperative tree algorithms inside
the NameNode (CrossAZBlockPlacementPolicy.java); here the topology is
a flattened dimension table (datanodes with an ``ancestors`` array),
replicas are a fact table, and every per-block computation is a
``groupBy("block_id")`` — which is what makes the same logic run over
billions of blocks on a cluster.
"""

from crossfire_spark.placement.api import (  # noqa: F401
    choose_targets,
    deletion_candidates,
    verify,
    verify_placement,
    verify_placement_fast,
)
