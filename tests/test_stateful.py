"""Stateful streaming operator: per-key running totals survive across
micro-batches via the state store."""

from __future__ import annotations

import os

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
    parse_billing,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources import (
    billing_stream_source,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.streaming.stateful import (
    running_totals_per_type,
)

from conftest import billing_record


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    with open(os.path.join(input_dir, "b1.json"), "w") as f:
        f.write(billing_record("transfer", fileSize=100.0) + "\n")
        f.write(billing_record("transfer", fileSize=50.0) + "\n")
        f.write(billing_record("remove", fileSize=10.0) + "\n")

    src = billing_stream_source(spark, "file", path=input_dir, max_files_per_trigger=1)
    out = running_totals_per_type(parse_billing(src))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()

    # second batch arrives → state carries forward
    with open(os.path.join(input_dir, "b2.json"), "w") as f:
        f.write(billing_record("transfer", fileSize=25.0) + "\n")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from state_out").collect()
    latest = {}
    for r in rows:  # update mode appends each emitted update; last wins
        latest[r.msgType] = (r.n_total, r.bytes_total)
    assert latest["transfer"] == (3, 175.0)
    assert latest["remove"] == (1, 10.0)
