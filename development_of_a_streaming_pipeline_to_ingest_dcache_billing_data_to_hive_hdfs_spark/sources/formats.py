"""Batch format connectors: parquet / orc / csv / json read+write with an
explicit schema contract.

The reference's only storage format is Hive-backed Parquet
(`Dcache_kafka_to_hive.py:188` STORED AS PARQUET); these wrappers widen
the engine to the formats a warehouse actually exchanges data in, with
two scale rules baked in:

- **Reads always take a schema** for csv/json. Schema inference scans
  the data once before the real job — at 100 TB that is a full extra
  pass. Parquet/orc carry their own schema, so none is required.
- **Writes size files, not file counts.** ``target_file_rows`` bounds
  rows per output file via ``maxRecordsPerFile`` instead of
  coalesce/repartition games, so the write parallelism stays whatever
  the upstream plan produced but no small-file storm lands on HDFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "orc", "csv", "json")

# formats whose files embed their own schema
_SELF_DESCRIBING = ("parquet", "orc")


def read_batch(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. csv/json REQUIRE an explicit schema (no
    silent inference pass); csv defaults to header=true to match
    ``write_batch``."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {BATCH_FORMATS}")
    if fmt not in _SELF_DESCRIBING and schema is None:
        raise ValueError(
            f"{fmt} reads need an explicit schema — inference would scan "
            "the data twice; pass schema= (StructType or DDL string)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_batch(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt``. ``target_file_rows`` caps
    rows per file (maxRecordsPerFile) without touching partitioning;
    csv writes header=true to match ``read_batch``."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {BATCH_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if target_file_rows is not None:
        options["maxRecordsPerFile"] = str(target_file_rows)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
