"""Parse + route semantics ≙ reference `Dcache_kafka_to_hive.py:56-141`
(SURVEY §5.2): JSON flatten, typed casts, msgType routing incl. the
rejects path the reference lacks, partition-date derivation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
    CORRUPT_FIELD,
    parse_billing,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.route import route
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.schema import (
    PARTITION_FIELD,
    ROUTE_COLUMNS,
)

from conftest import billing_record


def test_parse_types_and_flatten(spark, billing_batch):
    parsed = parse_billing(billing_batch)
    schema = {f.name: f.dataType for f in parsed.schema.fields}
    assert schema["isP2p"] == T.BooleanType()
    assert schema["transferTime"] == T.DoubleType()
    assert schema["fileSize"] == T.DoubleType()
    assert schema["status_code"] == T.IntegerType()
    assert schema["protocolInfo_port"] == T.IntegerType()
    assert schema["queuingTime"] == T.LongType()
    assert schema["event_ts"] == T.TimestampType()
    row = parsed.where("msgType = 'transfer'").first()
    assert row.status_msg == "ok" and row.status_code == 0
    assert row.protocolInfo_protocol == "Xrootd" and row.protocolInfo_port == 1094
    assert row[PARTITION_FIELD] == "2024-03-01" or row[PARTITION_FIELD] == "2024-02-28"


def test_missing_fields_null(spark):
    # A transfer lacking optional keys parses with NULLs, never throws
    # (contract ≙ reference docstring :58-61).
    rec = json.dumps({"date": "2024-03-01T00:00:00.000+0000", "msgType": "transfer"})
    df = spark.createDataFrame([(rec,)], ["value"])
    row = parse_billing(df).first()
    assert row.cellName is None and row.transferSize is None
    assert row[CORRUPT_FIELD] is None
    assert row[PARTITION_FIELD] == "2024-03-01"


def test_route_fanout_and_rejects(spark, billing_batch):
    routed = route(parse_billing(billing_batch))
    counts = {k: v.count() for k, v in routed.items()}
    assert counts == {
        "transfers": 2, "requests": 1, "storage": 2, "removes": 1, "rejects": 2,
    }
    # every input row lands in exactly one route
    assert sum(counts.values()) == billing_batch.count()


def test_route_column_contracts(spark, billing_batch):
    # Positional-insert safety (SURVEY §2.7): column order is pinned.
    routed = route(parse_billing(billing_batch))
    for name, cols in ROUTE_COLUMNS.items():
        assert routed[name].columns == cols + [PARTITION_FIELD]


def test_corrupt_json_reaches_rejects(spark, billing_batch):
    rejects = route(parse_billing(billing_batch))["rejects"]
    raws = [r[CORRUPT_FIELD] for r in rejects.collect()]
    assert "{not valid json" in raws


def test_late_record_lands_in_own_partition(spark):
    # Late data routes to its (old) event-date partition — the reference's
    # implicit late-data semantics, preserved (SURVEY §2.4 watermark row).
    rec = billing_record("transfer", date="2020-01-15T08:00:00.000+0000")
    df = spark.createDataFrame([(rec,)], ["value"])
    assert parse_billing(df).first()[PARTITION_FIELD] == "2020-01-15"


@pytest.mark.parametrize("bad", ["null", "[]", '""', "42"])
def test_non_object_json_is_rejected(spark, bad):
    df = spark.createDataFrame([(bad,)], ["value"])
    routed = route(parse_billing(df))
    assert routed["rejects"].count() == 1


def test_malformed_date_is_not_a_poison_pill(spark):
    """A valid-JSON record with a garbage date must not kill the batch
    (ANSI to_timestamp would throw on every replay): it parses with a
    NULL event_ts and a NULL partition key (default partition), instead
    of minting a junk partition_date=<garbage> directory."""
    import json as _json

    recs = [
        (_json.dumps({"msgType": "transfer", "date": "not-a-date",
                      "cellName": "c"}),),
        (_json.dumps({"msgType": "transfer", "date": "2024-13-99T10:00:00",
                      "cellName": "c"}),),   # shape ok, impossible date
        (_json.dumps({"msgType": "transfer",
                      "date": "2024-03-01T10:00:00.000+0000",
                      "cellName": "c"}),),
    ]
    out = parse_billing(spark.createDataFrame(recs, ["value"])).select(
        "date", "partition_date", "event_ts", "_corrupt_value"
    ).collect()
    by_date = {r.date: r for r in out}
    assert by_date["not-a-date"].partition_date is None
    assert by_date["not-a-date"].event_ts is None
    assert by_date["2024-13-99T10:00:00"].partition_date is None
    good = by_date["2024-03-01T10:00:00.000+0000"]
    assert good.partition_date == "2024-03-01"
    assert good.event_ts is not None
    # none of them are corrupt-JSON rows
    assert all(r._corrupt_value is None for r in out)


def test_non_canonical_date_prefix_rejected(spark):
    """Loose-parsing prefixes ('2024-3-1T1') must NOT mint raw-string
    partition dirs: only canonical YYYY-MM-DD prefixes become keys."""
    import json as _json

    recs = [
        (_json.dumps({"msgType": "transfer", "date": "2024-3-1T10:00:00",
                      "cellName": "c"}),),
        (_json.dumps({"msgType": "transfer",
                      "date": "2024-03-01T10:00:00.000+0000",
                      "cellName": "c"}),),
    ]
    out = parse_billing(spark.createDataFrame(recs, ["value"])).select(
        "date", "partition_date"
    ).collect()
    got = {r.date: r.partition_date for r in out}
    assert got["2024-3-1T10:00:00"] is None
    assert got["2024-03-01T10:00:00.000+0000"] == "2024-03-01"


def test_schema_drift_stats_on_billing_feed(spark):
    """The drift detector surfaces fields the typed parse silently
    drops: a producer adding 'experimentalTag' shows up is_known=false;
    corrupt rows don't crash the report; known keys stay known."""
    import json as _json

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
        schema_drift_stats,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.schema import (
        BILLING_SCHEMA,
    )

    known = {f.name for f in BILLING_SCHEMA.fields}
    rows = [
        _json.dumps({"msgType": "transfer", "date": "2024-03-01T10:00:00",
                     "fileSize": 1.0}),
        _json.dumps({"msgType": "remove", "date": "2024-03-01T11:00:00",
                     "experimentalTag": "A"}),
        _json.dumps({"msgType": "transfer", "experimentalTag": "B",
                     "newNestedThing": {"x": 1}}),
        "{corrupt json",
    ]
    df = spark.createDataFrame([(v,) for v in rows], ["value"])
    got = {
        r.json_key: (r.n_rows, r.is_known)
        for r in schema_drift_stats(df, known).collect()
    }
    assert got["msgType"] == (3, True)
    assert got["experimentalTag"] == (2, False)
    assert got["newNestedThing"] == (1, False)
    assert "corrupt" not in " ".join(got)  # malformed rows drop out
