"""Placement library functions: the reference's three NameNode entry
points (SURVEY §3) as DataFrame-returning functions.

Design for scale: the topology (``datanodes``/``storages``) is a
broadcast-sized dimension (thousands of rows even for huge clusters);
``replicas`` is the fact table that grows to billions of rows. Every
function below keeps per-block work distributed — either pure
DataFrame aggregation (verify) or ``applyInPandas`` over
``groupBy("block_id")`` (the iterative greedy algorithms, whose rounds
touch only one block's handful of replicas at a time — SURVEY §7.3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pair_explode(df: DataFrame, leaf_col: str) -> DataFrame:
    """Explode each row's ancestor chain into (parent, child) edges.

    Replaces the reference's recursive tree walk
    (``CrossAZBlockPlacementPolicy.java:388-399``, J4) with a bounded
    array explode: ``["/", "/dc", "/dc/rack"] + [leaf]`` yields edges
    ``(/, /dc), (/dc, /dc/rack), (/dc/rack, leaf)``.
    """
    chained = df.withColumn(
        "_chain", F.concat(F.col("ancestors"), F.array(F.col(leaf_col)))
    )
    return chained.select(
        "*",
        F.expr(
            "explode(transform(sequence(1, size(_chain) - 1),"
            " i -> struct(element_at(_chain, i) as parent,"
            "             element_at(_chain, i + 1) as child)))"
        ).alias("_edge"),
    ).select(
        *[c for c in df.columns if c not in ("ancestors",)],
        F.col("_edge.parent").alias("parent"),
        F.col("_edge.child").alias("child"),
    )


def verify_placement(
    replicas: DataFrame,
    datanodes: DataFrame,
    required: DataFrame | int,
) -> DataFrame:
    """Re-implements ``verifyBlockPlacementBalancedOptimal``
    (``CrossAZBlockPlacementPolicy.java:385-516``) as one declarative
    plan per the A2 two-level aggregation:

    For every block and every topology parent (root, each DC, each
    rack): the children actually used must equal
    ``min(replicas under parent, children available)`` (spread check,
    ``:436-497``) and the per-child replica counts must satisfy
    ``max - min <= 1`` (balance check); plus the root count check
    ``replica_cnt >= required`` (``:417-434``).

    ``required`` is an int applied to all blocks or a DataFrame
    ``(block_id, required_replicas)`` — the latter also surfaces blocks
    with zero replicas (the reference's empty-input case,
    ``TestCrossAZBlockPlacementPolicy.java:129``).

    Returns ``(block_id, replica_cnt, satisfied, reason)``.
    """
    leafed = datanodes.withColumn(
        "node_path", F.concat_ws("/", "location", "hostname")
    )

    # available children per parent, from the (broadcast-size) topology
    avail = (
        _pair_explode(leafed.select("ancestors", "node_path"), "node_path")
        .select("parent", "child")
        .distinct()
        .groupBy("parent")
        .agg(F.count(F.lit(1)).alias("available"))
    )

    placed = replicas.join(
        F.broadcast(leafed.select("datanode_id", "ancestors", "node_path")),
        "datanode_id",
    )
    edges = _pair_explode(placed, "node_path")

    per_child = edges.groupBy("block_id", "parent", "child").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_parent = (
        per_child.groupBy("block_id", "parent")
        .agg(
            F.count(F.lit(1)).alias("used"),
            F.sum("cnt").alias("under"),
            (F.max("cnt") - F.min("cnt")).alias("imbalance"),
        )
        .join(F.broadcast(avail), "parent")
        .withColumn(
            "parent_ok",
            (F.col("used") == F.least(F.col("under"), F.col("available")))
            & (F.col("imbalance") <= 1),
        )
    )

    per_block = per_parent.groupBy("block_id").agg(
        F.max(F.when(F.col("parent") == "/", F.col("under"))).alias("replica_cnt"),
        F.min(F.col("parent_ok").cast("int")).cast("boolean").alias("spread_ok"),
    )

    if isinstance(required, int):
        req = per_block.select("block_id").withColumn(
            "required_replicas", F.lit(required)
        )
    else:
        req = required.select("block_id", "required_replicas")

    out = (
        req.join(per_block, "block_id", "left")
        .na.fill({"replica_cnt": 0, "spread_ok": False})
        .withColumn("count_ok", F.col("replica_cnt") >= F.col("required_replicas"))
        .withColumn("satisfied", F.col("count_ok") & F.col("spread_ok"))
        .withColumn(
            "reason",
            F.when(~F.col("count_ok"), F.lit("under_replicated"))
            .when(~F.col("spread_ok"), F.lit("not_spread_or_imbalanced"))
            .otherwise(F.lit("ok")),
        )
    )
    return out.select("block_id", "replica_cnt", "satisfied", "reason")


_DELETE_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("storage_id", T.StringType()),
        T.StructField("datanode_id", T.LongType()),
    ]
)


def deletion_candidates(
    replicas: DataFrame,
    datanodes: DataFrame,
    storages: DataFrame,
    keep: int,
    two_dc_clamp: bool = True,
) -> DataFrame:
    """Re-implements ``chooseReplicasToDelete``
    (``CrossAZBlockPlacementPolicy.java:294-362``, W2 iterative drain):
    repeatedly delete the lowest-priority replica until ``keep``
    remain, re-ranking after every removal (crowding counts change).

    Priority (deterministic form of ``selectForDeletion`` ``:518-585``,
    quirk §4.3 dropped): FAILED storage first, then most-crowded rack,
    then most-crowded datacenter, then least remaining space, then
    storage_id. The 2-DC clamp ``min(4, keep)`` (``:302-306``) is kept
    behind a flag. Hints/excess_types are ignored exactly as the
    reference ignores them (``:295-300``).

    Distributed shape: ``groupBy("block_id").applyInPandas`` — each
    block's drain loop runs where its replicas live; the topology join
    happens before the shuffle so the pandas function sees only its
    own rows.
    """
    n_dcs = datanodes.select("datacenter").distinct().count()
    eff_keep = min(4, keep) if (two_dc_clamp and n_dcs == 2) else keep

    enriched = replicas.join(
        F.broadcast(datanodes.select("datanode_id", "datacenter", "rack")),
        "datanode_id",
    ).join(
        F.broadcast(storages.select("storage_id", "state", "remaining")),
        "storage_id",
    )

    def drain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        out = []
        rnd = 0
        while len(pdf) > eff_keep:
            # all-FAILED safety: delete nothing (:356-362)
            if (pdf["state"] == "FAILED").all():
                break
            rack_cnt = pdf.groupby(["datacenter", "rack"])["storage_id"].transform(
                "count"
            )
            dc_cnt = pdf.groupby("datacenter")["storage_id"].transform("count")
            key = pd.DataFrame(
                {
                    "failed": (pdf["state"] != "FAILED").astype(int),  # FAILED first
                    "rack_crowd": -rack_cnt,
                    "dc_crowd": -dc_cnt,
                    "remaining": pdf["remaining"],
                    "storage_id": pdf["storage_id"],
                }
            )
            victim = key.sort_values(
                ["failed", "rack_crowd", "dc_crowd", "remaining", "storage_id"]
            ).index[0]
            out.append(
                (
                    int(pdf.loc[victim, "block_id"]),
                    rnd,
                    pdf.loc[victim, "storage_id"],
                    int(pdf.loc[victim, "datanode_id"]),
                )
            )
            pdf = pdf.drop(index=victim)
            rnd += 1
        return pd.DataFrame(
            out, columns=["block_id", "round", "storage_id", "datanode_id"]
        )

    return enriched.groupBy("block_id").applyInPandas(drain, schema=_DELETE_SCHEMA)


_CHOOSE_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.LongType()),
        T.StructField("slot", T.IntegerType()),
        T.StructField("datanode_id", T.LongType()),
        T.StructField("storage_id", T.StringType()),
    ]
)


def choose_targets(
    blocks: DataFrame,
    replicas: DataFrame,
    datanodes: DataFrame,
    storages: DataFrame,
    storage_type: str = "SSD",
) -> DataFrame:
    """Re-implements ``chooseTarget``
    (``CrossAZBlockPlacementPolicy.java:103-219,587-721``) as a
    distributed greedy selection.

    ``blocks`` is ``(block_id, additional)``. For each block, each new
    replica goes to the datacenter with the least speculative load
    (current + already planned, A6 ``:675-685``), then the least-loaded
    rack within it (``:688-705``), then an unused healthy node, on its
    best storage by the W3 preference (demanded type, most remaining,
    lowest xceiver — ``:150-156``; deterministic tiebreak: node id).
    Health predicate P3 (``:365-371``) and storage predicate P4
    (``:166-188``) are applied as filters before selection.

    The topology candidate list is collected once (broadcast-sized
    dimension) and shipped in the task closure; per-block greedy loops
    run distributed via ``applyInPandas``.
    """
    healthy = (
        datanodes.where(
            F.col("is_alive")
            & ~F.col("is_decommissioned")
            & ~F.col("is_stale")
        )
        .select("datanode_id", "datacenter", "rack", "xceiver_count")
    )
    best_storage = (
        storages.where(
            (F.col("state") == "NORMAL") & (F.col("type") == storage_type)
        )
        .groupBy("datanode_id")
        .agg(F.max_by("storage_id", "remaining").alias("storage_id"),
             F.max("remaining").alias("remaining"))
    )
    candidates = (
        healthy.join(best_storage, "datanode_id")
        .toPandas()
        .sort_values("datanode_id")
        .reset_index(drop=True)
    )

    existing = blocks.join(
        replicas.join(
            F.broadcast(datanodes.select("datanode_id", "datacenter", "rack")),
            "datanode_id",
        ).select("block_id", "datanode_id", "datacenter", "rack"),
        "block_id",
        "left",
    )

    def choose(pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = int(pdf["block_id"].iloc[0])
        additional = int(pdf["additional"].iloc[0])
        used_nodes = set(pdf["datanode_id"].dropna().astype(int))
        dc_load = pdf.dropna(subset=["datanode_id"]).groupby("datacenter").size().to_dict()
        rack_load = (
            pdf.dropna(subset=["datanode_id"])
            .groupby(["datacenter", "rack"])
            .size()
            .to_dict()
        )
        pool = candidates[~candidates["datanode_id"].isin(used_nodes)]
        out = []
        for slot in range(additional):
            if pool.empty:
                break
            dcs = sorted(pool["datacenter"].unique())
            dc = min(dcs, key=lambda d: (dc_load.get(d, 0), d))
            in_dc = pool[pool["datacenter"] == dc]
            racks = sorted(in_dc["rack"].unique())
            rack = min(racks, key=lambda rk: (rack_load.get((dc, rk), 0), rk))
            in_rack = in_dc[in_dc["rack"] == rack]
            # W3 preference: most remaining, then fewest xceivers, then id
            pick = in_rack.sort_values(
                ["remaining", "xceiver_count", "datanode_id"],
                ascending=[False, True, True],
            ).iloc[0]
            out.append((block_id, slot, int(pick["datanode_id"]), pick["storage_id"]))
            dc_load[dc] = dc_load.get(dc, 0) + 1
            rack_load[(dc, rack)] = rack_load.get((dc, rack), 0) + 1
            pool = pool[pool["datanode_id"] != pick["datanode_id"]]
        return pd.DataFrame(
            out, columns=["block_id", "slot", "datanode_id", "storage_id"]
        )

    return existing.groupBy("block_id").applyInPandas(choose, schema=_CHOOSE_SCHEMA)
