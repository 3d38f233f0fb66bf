"""Streaming sources: Kafka (production) or file directory (tests).

≙ `Streaming.__init__` (`Dcache_kafka_to_hive.py:282-301`): the reference
subscribes to Kafka by pattern with ``includeHeaders=true`` and
``failOnDataLoss=false``. Both option sets are preserved verbatim here;
the file source produces the same-shaped frame (a ``value`` string column)
so every downstream operator is source-agnostic and tests run without a
broker. The Kafka path needs the spark-sql-kafka package on the classpath
(not in this image) — gated, not stubbed silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def billing_stream_source(
    spark: SparkSession,
    kind: str = "file",
    *,
    path: str | None = None,
    kafka_bootstrap: str | None = None,
    subscribe_pattern: str | None = None,
    fail_on_data_loss: bool = False,
    include_headers: bool = True,
    max_files_per_trigger: int | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Return a streaming DataFrame with a string ``value`` column.

    kind='kafka' ≙ `Dcache_kafka_to_hive.py:293-301` (subscribePattern,
    includeHeaders, failOnDataLoss preserved); kind='file' reads text
    files of newline-delimited JSON for broker-less tests.

    Backpressure: ``max_offsets_per_trigger`` (kafka) /
    ``max_files_per_trigger`` (file) bound each micro-batch, so a
    restart against a backlog (hours of broker lag, a bulk file drop)
    drains in many right-sized batches instead of one giant batch that
    blows past executor memory and holds the exactly-once commit open
    for the whole backlog.
    """
    if kind == "kafka":
        if not (kafka_bootstrap and subscribe_pattern):
            raise ValueError("kafka source needs kafka_bootstrap and subscribe_pattern")
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribePattern", subscribe_pattern)
            .option("includeHeaders", str(include_headers).lower())
            .option("failOnDataLoss", str(fail_on_data_loss).lower())
        )
        if max_offsets_per_trigger:
            reader = reader.option(
                "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
            )
        return reader.load()
    if kind == "file":
        if not path:
            raise ValueError("file source needs path")
        reader = spark.readStream.schema(T.StructType([T.StructField("value", T.StringType())]))
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader.text(path).withColumnRenamed("value", "value")
    raise ValueError(f"unknown source kind: {kind}")
