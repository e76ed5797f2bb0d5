"""Sources & sinks: file formats and the JSON report sink."""

from crossfire_spark.sources.io import (  # noqa: F401
    read_table,
    topology_report,
    write_table,
)
