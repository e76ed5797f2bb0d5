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
    # replicas referencing a datanode absent from the topology would be
    # silently dropped by the inner join above; the reference counts
    # every non-null datanode handed to it, so count them per block and
    # surface them (replica_cnt includes them, spread is unverifiable).
    orphans = (
        replicas.join(
            F.broadcast(leafed.select("datanode_id")), "datanode_id", "left_anti"
        )
        .groupBy("block_id")
        .agg(F.count(F.lit(1)).alias("orphan_cnt"))
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
        .join(orphans, "block_id", "left")
        .na.fill({"replica_cnt": 0, "spread_ok": False, "orphan_cnt": 0})
        .withColumn("replica_cnt", F.col("replica_cnt") + F.col("orphan_cnt"))
        .withColumn("count_ok", F.col("replica_cnt") >= F.col("required_replicas"))
        .withColumn(
            "satisfied",
            F.col("count_ok") & F.col("spread_ok") & (F.col("orphan_cnt") == 0),
        )
        .withColumn(
            "reason",
            F.when(F.col("orphan_cnt") > 0, F.lit("orphan_replica"))
            .when(~F.col("count_ok"), F.lit("under_replicated"))
            .when(~F.col("spread_ok"), F.lit("not_spread_or_imbalanced"))
            .otherwise(F.lit("ok")),
        )
    )
    return out.select("block_id", "replica_cnt", "satisfied", "reason")


# buckets for grouped-map ops: enough for full-cluster parallelism,
# few enough that each pandas call amortizes its dispatch overhead
DRAIN_BUCKETS = 128

def verify_placement_fast(
    replicas: DataFrame, required: DataFrame | int
) -> DataFrame:
    """The O(1)-per-block downgrade of verification
    (``verifyBlockPlacementFast``, ``CrossAZBlockPlacementPolicy.java:373-383``):
    satisfied iff replica count >= required — intentionally weak, it
    passes even when every replica sits on one rack (§4.3). Same
    output schema as ``verify_placement`` so callers can switch.
    """
    counts = replicas.groupBy("block_id").agg(F.count(F.lit(1)).alias("replica_cnt"))
    if isinstance(required, int):
        req = counts.select("block_id").withColumn(
            "required_replicas", F.lit(required)
        )
    else:
        req = required.select("block_id", "required_replicas")
    return (
        req.join(counts, "block_id", "left")
        .na.fill({"replica_cnt": 0})
        .withColumn("satisfied", F.col("replica_cnt") >= F.col("required_replicas"))
        .withColumn(
            "reason",
            F.when(F.col("satisfied"), F.lit("ok")).otherwise(
                F.lit("under_replicated")
            ),
        )
        .select("block_id", "replica_cnt", "satisfied", "reason")
    )


def verify(
    replicas: DataFrame,
    datanodes: DataFrame,
    required: DataFrame | int,
    fast_verify: bool = False,
    do_placement_only: bool = False,
) -> DataFrame:
    """Config-switched dispatcher mirroring the reference's hot flags
    (``use_fast_verify`` / ``do_placement_only``,
    ``CrossAZBlockPlacementPolicy.java:283-291``, toggled over HTTP in
    ``Plugin.java:198-213``): placement-only short-circuits to
    constant OK, fast does the count check, full runs the hierarchy
    aggregation."""
    if do_placement_only:
        base = required if not isinstance(required, int) else (
            replicas.select("block_id").distinct().withColumn(
                "required_replicas", F.lit(required)
            )
        )
        counts = replicas.groupBy("block_id").agg(
            F.count(F.lit(1)).alias("replica_cnt")
        )
        return (
            base.select("block_id")
            .join(counts, "block_id", "left")
            .na.fill({"replica_cnt": 0})
            .select(
                "block_id",
                "replica_cnt",
                F.lit(True).alias("satisfied"),
                F.lit("placement_only").alias("reason"),
            )
        )
    if fast_verify:
        return verify_placement_fast(replicas, required)
    return verify_placement(replicas, datanodes, required)


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

    # Only blocks that actually exceed the target enter the Python
    # drain — at a billion blocks, most are already at target and
    # must never pay the applyInPandas round-trip.
    over = (
        replicas.groupBy("block_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > eff_keep)
        .select("block_id")
    )
    enriched = (
        replicas.join(over, "block_id", "left_semi")
        .join(
            F.broadcast(datanodes.select("datanode_id", "datacenter", "rack")),
            "datanode_id",
        )
        .join(
            F.broadcast(storages.select("storage_id", "state", "remaining")),
            "storage_id",
        )
    )

    def drain_block(rows: list[tuple]) -> list[tuple]:
        # rows: (block_id, storage_id, datanode_id, state, remaining,
        # datacenter, rack) — a handful per block, so plain tuples:
        # pandas per-round transforms on 6-row frames cost more than
        # the whole drain.
        from collections import Counter

        out = []
        rnd = 0
        while len(rows) > eff_keep:
            if all(r[3] == "FAILED" for r in rows):
                break  # all-FAILED safety: delete nothing (:356-362)
            rack_cnt = Counter((r[5], r[6]) for r in rows)
            dc_cnt = Counter(r[5] for r in rows)
            victim = min(
                rows,
                key=lambda r: (
                    0 if r[3] == "FAILED" else 1,  # FAILED first
                    -rack_cnt[(r[5], r[6])],  # most-crowded rack
                    -dc_cnt[r[5]],  # most-crowded datacenter
                    r[4],  # least remaining
                    r[1],  # storage_id tiebreak
                ),
            )
            out.append((victim[0], rnd, victim[1], victim[2]))
            rows.remove(victim)
            rnd += 1
        return out

    def drain_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        cols = [
            "block_id",
            "storage_id",
            "datanode_id",
            "state",
            "remaining",
            "datacenter",
            "rack",
        ]
        per_block: dict[int, list[tuple]] = {}
        for row in pdf[cols].itertuples(index=False):
            per_block.setdefault(row[0], []).append(tuple(row))
        for block_id in sorted(per_block):
            out.extend(drain_block(per_block[block_id]))
        return pd.DataFrame(
            out, columns=["block_id", "round", "storage_id", "datanode_id"]
        )

    # Bucket many blocks into one pandas call: per-group Python
    # dispatch costs ~5-10 ms, which at millions of tiny groups IS
    # the runtime. Buckets keep parallelism (hash over blocks) while
    # amortizing the round-trip.
    bucketed = enriched.withColumn(
        "_bucket", F.pmod(F.col("block_id"), F.lit(DRAIN_BUCKETS))
    )
    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(drain_bucket, schema=_DELETE_SCHEMA)
    )


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
    exclude_nodes: list[int] | None = None,
    favored_nodes: list[int] | None = None,
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

    ``exclude_nodes`` are dropped from the candidate pool (the
    reference's exclusion predicate P5, ``:162-165``); ``favored_nodes``
    are consumed first, in the given order, when healthy and unused
    (the favored-nodes overload exercised at
    ``TestCrossAZBlockPlacementPolicy.java:375,401-424``) — remaining
    slots fall back to the greedy least-loaded selection, exactly as
    the reference falls back to normal placement.
    """
    excluded = set(exclude_nodes or [])
    favored = [n for n in (favored_nodes or []) if n not in excluded]
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
    # (datanode_id, datacenter, rack, xceiver, storage_id, remaining),
    # as plain tuples: the per-slot greedy scans this list, and tuple
    # scans beat pandas filtering by ~100x at topology sizes.
    candidates = [
        (
            int(r.datanode_id),
            r.datacenter,
            r.rack,
            int(r.xceiver_count),
            r.storage_id,
            int(r.remaining),
        )
        for r in healthy.join(best_storage, "datanode_id")
        .orderBy("datanode_id")
        .collect()
        if int(r.datanode_id) not in excluded
    ]
    by_id = {c[0]: c for c in candidates}
    favored_cands = [by_id[n] for n in favored if n in by_id]

    existing = blocks.where(F.col("additional") > 0).join(
        replicas.join(
            F.broadcast(datanodes.select("datanode_id", "datacenter", "rack")),
            "datanode_id",
        ).select("block_id", "datanode_id", "datacenter", "rack"),
        "block_id",
        "left",
    )

    def choose_block(
        block_id: int, additional: int, existing_rows: list[tuple]
    ) -> list[tuple]:
        # existing_rows: (datanode_id, datacenter, rack) of current
        # replicas (possibly empty). Greedy per slot over the candidate
        # tuple list: least-loaded DC -> least-loaded rack -> best node.
        used_nodes = {r[0] for r in existing_rows if r[0] is not None}
        dc_load: dict[str, int] = {}
        rack_load: dict[tuple[str, str], int] = {}
        for r in existing_rows:
            if r[0] is None:
                continue
            dc_load[r[1]] = dc_load.get(r[1], 0) + 1
            rack_load[(r[1], r[2])] = rack_load.get((r[1], r[2]), 0) + 1
        pool = [c for c in candidates if c[0] not in used_nodes]
        out = []
        queue = [c for c in favored_cands if c[0] not in used_nodes]
        for slot in range(additional):
            if queue:
                pick = queue.pop(0)
                out.append((block_id, slot, pick[0], pick[4]))
                dc_load[pick[1]] = dc_load.get(pick[1], 0) + 1
                rack_load[(pick[1], pick[2])] = (
                    rack_load.get((pick[1], pick[2]), 0) + 1
                )
                pool = [c for c in pool if c[0] != pick[0]]
                continue
            if not pool:
                break
            dcs = {c[1] for c in pool}
            dc = min(dcs, key=lambda d: (dc_load.get(d, 0), d))
            in_dc = [c for c in pool if c[1] == dc]
            racks = {c[2] for c in in_dc}
            rack = min(racks, key=lambda rk: (rack_load.get((dc, rk), 0), rk))
            in_rack = [c for c in in_dc if c[2] == rack]
            # W3 preference: most remaining, then fewest xceivers, then id
            pick = min(in_rack, key=lambda c: (-c[5], c[3], c[0]))
            out.append((block_id, slot, pick[0], pick[4]))
            dc_load[dc] = dc_load.get(dc, 0) + 1
            rack_load[(dc, rack)] = rack_load.get((dc, rack), 0) + 1
            pool = [c for c in pool if c[0] != pick[0]]
        return out

    def choose_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        per_block: dict[tuple[int, int], list[tuple]] = {}
        for row in pdf[
            ["block_id", "additional", "datanode_id", "datacenter", "rack"]
        ].itertuples(index=False):
            key = (int(row[0]), int(row[1]))
            node = None if pd.isna(row[2]) else int(row[2])
            per_block.setdefault(key, []).append((node, row[3], row[4]))
        for (block_id, additional) in sorted(per_block):
            out.extend(choose_block(block_id, additional, per_block[(block_id, additional)]))
        return pd.DataFrame(
            out, columns=["block_id", "slot", "datanode_id", "storage_id"]
        )

    bucketed = existing.withColumn(
        "_bucket", F.pmod(F.col("block_id"), F.lit(DRAIN_BUCKETS))
    )
    return bucketed.groupBy("_bucket").applyInPandas(
        choose_bucket, schema=_CHOOSE_SCHEMA
    )
