"""Batch table loading for the star-schema testdata and warehouse tables.

≙ the reference's batch scans (`spark.sql("select * from db.t where
partition_date=…")`, `Dcache_kafka_to_hive.py:376-377`) — here expressed
as partition-pruned DataFrame reads. Filters/projections applied by
callers push down to the Parquet scan via Catalyst (verify with
``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Tables whose parquet footers declare TIMESTAMP(NANOS), which the Spark
# vectorized reader rejects (SPARK-40819). Read them as raw nanos longs
# and convert to microsecond timestamps (Spark's native precision).
NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = NANOS_TS_COLUMNS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Expose the tables as temp views for the SQL API surface."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
