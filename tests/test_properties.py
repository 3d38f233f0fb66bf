"""Property-based parser/router tests (SURVEY §5.5, hypothesis): random
JSON records with missing/extra/nested/typed-wrong fields never throw,
and every input row lands in exactly one route."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
    parse_billing,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.route import route

scalar = st.one_of(
    st.none(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
    st.booleans(),
)

record = st.fixed_dictionaries(
    {},
    optional={
        "date": st.one_of(st.none(), st.text(max_size=30),
                          st.just("2024-03-01T10:00:00.000+0000")),
        "msgType": st.one_of(
            st.none(),
            st.sampled_from(["transfer", "request", "store", "restore", "remove"]),
            st.text(max_size=10),
        ),
        "queuingTime": scalar,
        "fileSize": scalar,
        "isP2p": scalar,
        "status": st.one_of(scalar, st.fixed_dictionaries({"msg": st.text(max_size=5), "code": st.integers(-100, 100)})),
        "protocolInfo": st.one_of(scalar, st.fixed_dictionaries({"protocol": st.text(max_size=5), "port": st.integers(0, 65535)})),
        "extraUnknownField": scalar,
        "nested": st.dictionaries(st.text(max_size=4), scalar, max_size=3),
    },
)

payload = st.one_of(
    record.map(json.dumps),
    st.text(max_size=40),  # arbitrary garbage
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.lists(payload, min_size=1, max_size=25))
def test_every_row_lands_in_exactly_one_route(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["value"])
    routed = route(parse_billing(df))
    counts = {k: v.count() for k, v in routed.items()}
    assert sum(counts.values()) == len(values)
