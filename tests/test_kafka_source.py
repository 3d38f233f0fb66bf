"""Unit evidence for the Kafka branch of ``billing_stream_source``.

No broker or spark-sql-kafka jar exists in this image, so the live path
can't run — but the option wiring (≙ `Dcache_kafka_to_hive.py:293-301`:
subscribePattern, includeHeaders, failOnDataLoss, plus our
maxOffsetsPerTrigger backpressure) and the argument guards are pure
builder logic that a recording stub can pin down without any session.
A second group proves the pipeline TOLERATES the full Kafka frame
shape: binary ``value`` plus the ``headers ARRAY<STRUCT<key,value>>``
column that ``includeHeaders=true`` adds (`:298`) flows through
parse/route untouched instead of breaking column resolution.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
    parse_billing,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.route import (
    route,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.stream import (
    billing_stream_source,
)

LOADED = object()  # sentinel: what the stubbed reader.load() returns


class RecordingReader:
    """Stands in for DataStreamReader: records format + options, returns
    itself from every builder call, and a sentinel from load()."""

    def __init__(self):
        self.fmt = None
        self.opts: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, key, value):
        self.opts[key] = value
        return self

    def load(self):
        return LOADED


def fake_session():
    reader = RecordingReader()
    return SimpleNamespace(readStream=reader), reader


def test_kafka_branch_wires_reference_options():
    spark, reader = fake_session()
    out = billing_stream_source(
        spark,
        "kafka",
        kafka_bootstrap="broker-1:9092,broker-2:9092",
        subscribe_pattern="billing-.*",
    )
    assert out is LOADED
    assert reader.fmt == "kafka"
    assert reader.opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribePattern": "billing-.*",
        # reference defaults preserved verbatim (`:297-299`)
        "includeHeaders": "true",
        "failOnDataLoss": "false",
    }


def test_kafka_branch_backpressure_and_overrides():
    spark, reader = fake_session()
    billing_stream_source(
        spark,
        "kafka",
        kafka_bootstrap="b:9092",
        subscribe_pattern="t",
        fail_on_data_loss=True,
        include_headers=False,
        max_offsets_per_trigger=25_000,
    )
    assert reader.opts["failOnDataLoss"] == "true"
    assert reader.opts["includeHeaders"] == "false"
    assert reader.opts["maxOffsetsPerTrigger"] == "25000"


def test_kafka_branch_omits_backpressure_when_unset():
    spark, reader = fake_session()
    billing_stream_source(
        spark, "kafka", kafka_bootstrap="b:9092", subscribe_pattern="t"
    )
    assert "maxOffsetsPerTrigger" not in reader.opts


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # neither
        {"kafka_bootstrap": "b:9092"},  # missing pattern
        {"subscribe_pattern": "t"},  # missing bootstrap
    ],
)
def test_kafka_branch_guards(kwargs):
    spark, _ = fake_session()
    with pytest.raises(ValueError, match="kafka source needs"):
        billing_stream_source(spark, "kafka", **kwargs)


def test_file_branch_guard_and_unknown_kind():
    spark, _ = fake_session()
    with pytest.raises(ValueError, match="file source needs path"):
        billing_stream_source(spark, "file")
    with pytest.raises(ValueError, match="unknown source kind"):
        billing_stream_source(spark, "socket")


# ---------------------------------------------------------------------
# Kafka frame-shape tolerance: the real source yields BINARY value plus
# key/topic/partition/offset/timestamp/headers columns. parse/route must
# consume that frame as-is.
# ---------------------------------------------------------------------

KAFKA_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def _kafka_row(i: int, msg_type: str):
    body = (
        '{"msgType": "%s", "date": "2024-03-0%dT10:00:00.000+0000", '
        '"cellName": "pool-%d", "fileSize": %d.0, "queuingTime": %d, '
        '"status": {"msg": "ok", "code": 0}}' % (msg_type, i % 7 + 1, i, i, i)
    )
    return (
        b"key-%d" % i,
        body.encode(),
        "billing-topic",
        i % 4,
        i,
        None,
        [("trace-id", b"%d" % i), ("source", b"dcache")],
    )


def test_parse_route_tolerate_kafka_frame_with_headers(spark):
    rows = [
        _kafka_row(0, "transfer"),
        _kafka_row(1, "request"),
        _kafka_row(2, "store"),
        _kafka_row(3, "remove"),
        _kafka_row(4, "mystery"),
    ]
    frame = spark.createDataFrame(rows, KAFKA_FRAME_SCHEMA)
    parsed = parse_billing(frame)
    # the kafka metadata columns are consumed, not leaked downstream
    assert not {"headers", "topic", "offset"} & set(parsed.columns)
    routed = route(parsed)
    counts = {name: df.count() for name, df in routed.items()}
    assert counts["transfers"] == 1
    assert counts["requests"] == 1
    assert counts["storage"] == 1
    assert counts["removes"] == 1
    assert sum(v for k, v in counts.items() if "reject" in k) == 1
    got = routed["transfers"].select("cellName", "fileSize").first()
    assert got["cellName"] == "pool-0" and got["fileSize"] == 0.0


def test_headers_column_preserved_when_projected(spark):
    """A user who WANTS the headers (includeHeaders=true is the
    reference default) can carry them beside the parse: the typed
    from_json doesn't conflict with the kafka metadata columns."""
    frame = spark.createDataFrame(
        [_kafka_row(7, "transfer")], KAFKA_FRAME_SCHEMA
    )
    enriched = frame.select(
        "headers", F.col("value").alias("value")
    ).withColumn("n_headers", F.size("headers"))
    parsed = parse_billing(enriched.select("value"))
    assert parsed.count() == 1
    hdrs = enriched.select(
        F.expr("transform(headers, h -> h.key)").alias("keys"), "n_headers"
    ).first()
    assert hdrs["keys"] == ["trace-id", "source"] and hdrs["n_headers"] == 2
