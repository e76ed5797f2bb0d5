"""Sources and sinks (SURVEY §2.1).

The reference's only real I/O is classpath resources and a Gson JSON
rendering of cluster state served over HTTP
(``CrossAZBlockPlacementPolicyPlugin.java:221-262``,
``DNSToSwitchMappingReloadServicePlugin.java:135-155`` — S3/S4/P8).
The engine generalizes that to proper columnar I/O:

- ``read_table`` / ``write_table``: parquet (primary; vectorized reader,
  predicate pushdown), json, csv — with partitioned writes
  (``partitionBy``) so downstream scans get partition pruning, the
  moral equivalent of the reference's topology-subtree restriction
  (``CrossAZBlockPlacementPolicy.java:133-138``).
- ``topology_report``: the admin-UI JSON view as a DataFrame →
  ``to_json`` projection (P8's ``(ip, hostname, location)`` triple,
  sorted by (location, address) exactly like the UI table,
  ``crossaz-reconfigurable-plugin.html:104-118`` — O5).

Scale notes: writers never collect; JSON/CSV exist for interop and
reports, parquet is the data path. Partition counts follow the
DataFrame's own partitioning — callers repartition by the partition
columns before a partitioned write to avoid small-file explosions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = ("parquet", "json", "csv")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def topology_report(datanodes: DataFrame) -> DataFrame:
    """The admin-UI cluster view as rows of JSON documents:
    one document per datacenter with its racks and node addresses,
    sorted by (location, address) like the reference UI table."""
    nodes = datanodes.select(
        "datacenter",
        "rack",
        "location",
        F.concat_ws(":", "ip", "hostname").alias("address"),
    )
    per_rack = (
        nodes.groupBy("datacenter", "rack")
        .agg(F.sort_array(F.collect_list("address")).alias("addresses"))
        .groupBy("datacenter")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rack", "addresses"))
            ).alias("racks")
        )
    )
    return per_rack.select(
        "datacenter",
        F.to_json(F.struct("datacenter", "racks")).alias("report"),
    ).orderBy("datacenter")
