"""IncrementalRollup: change-feed-maintained aggregates must equal the
full recompute exactly — across multiple folds, crash replays,
compaction of the base table, and post-compaction ingest."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.rollup import (
    IncrementalRollup,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sink import (
    write_partitioned_batch,
)

SCHEMA = "event_id long, partition_date string, event_type string, value double"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rollup(spark, tmp_path):
    return IncrementalRollup(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "r"),
        keys=["partition_date", "event_type"],
        aggs={
            "n": ("count",),
            "sv": ("sum", F.col("value").cast("decimal(28,10)")),
            "mx": ("max", "value"),
        },
    )


def _assert_equal(ru):
    got = {tuple(r) for r in ru.read().collect()}
    want = {tuple(r) for r in ru.recompute().collect()}
    assert got == want and got


def test_rollup_folds_equal_recompute(spark, tmp_path):
    t = str(tmp_path / "t")
    b0 = _batch(spark, [(1, "2024-03-01", "a", 1.5), (2, "2024-03-01", "b", 2.0)])
    b1 = _batch(spark, [(3, "2024-03-01", "a", 0.25), (4, "2024-03-02", "a", 4.0)])
    b2 = _batch(spark, [(5, "2024-03-02", "a", 8.0)])
    ru = _rollup(spark, tmp_path)

    write_partitioned_batch(b0, t, 0)
    st = ru.fold()
    assert (st["version"], st["last_batch"], st["folded_batches"]) == (1, 0, 1)
    _assert_equal(ru)

    write_partitioned_batch(b1, t, 1)
    write_partitioned_batch(b2, t, 2)
    st = ru.fold()
    assert (st["version"], st["last_batch"]) == (2, 2)
    _assert_equal(ru)
    # caught up: fold is a no-op, no new version
    assert ru.fold()["folded_batches"] == 0
    assert ru.state()["version"] == 2
    # spot-check one merged cell: 2024-03-01/a = rows 1 and 3
    # partition-dir type inference reads the day key back as DATE
    row = {
        (str(r.partition_date), r.event_type): r
        for r in ru.read().collect()
    }[("2024-03-01", "a")]
    assert row.n == 2 and float(row.sv) == 1.75 and row.mx == 1.5


def test_rollup_crash_replay_converges(spark, tmp_path, monkeypatch):
    """State write is the commit point: a crash AFTER the new version's
    parquet lands but BEFORE the state write replays the same increment
    against the still-current version — same rollup, no double-fold."""
    t = str(tmp_path / "t")
    write_partitioned_batch(
        _batch(spark, [(1, "2024-03-01", "a", 1.0)]), t, 0
    )
    ru = _rollup(spark, tmp_path)
    ru.fold()
    write_partitioned_batch(
        _batch(spark, [(2, "2024-03-01", "a", 2.0)]), t, 1
    )
    real_write = ru.fs.write_text_atomic

    def dying(path, text):
        if path.endswith("_rollup_state.json"):
            raise RuntimeError("crash before state commit")
        real_write(path, text)

    monkeypatch.setattr(ru.fs, "write_text_atomic", dying)
    with pytest.raises(RuntimeError, match="crash"):
        ru.fold()
    monkeypatch.undo()
    # v2 parquet exists, but the rollup still reads v1 (torn-free)
    assert ru.state()["version"] == 1
    st = ru.fold()  # replay: overwrites v2, then commits the state
    assert (st["version"], st["last_batch"]) == (2, 1)
    _assert_equal(ru)


def test_rollup_survives_compaction_and_fails_fast_when_behind(
    spark, tmp_path
):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
        compact_table,
    )

    t = str(tmp_path / "t")
    for b in range(3):
        write_partitioned_batch(
            _batch(spark, [(b, "2024-03-01", "a", float(b))]), t, b
        )
    # exactly-once tables carry a ledger; compaction records its marker there
    (tmp_path / "t" / "_ledger.json").write_text(json.dumps([0, 1, 2]))
    ru = _rollup(spark, tmp_path)
    ru.fold()
    _assert_equal(ru)

    compact_table(spark, t)
    # caught-up rollup: compaction re-delivers nothing, equality holds
    assert ru.fold()["folded_batches"] == 0
    _assert_equal(ru)

    # post-compaction ingest keeps folding incrementally
    write_partitioned_batch(
        _batch(spark, [(9, "2024-03-02", "b", 9.0)]), t, 3
    )
    ru.fold()
    _assert_equal(ru)

    # a rollup that fell BEHIND the compaction marker fails loudly
    # instead of silently missing collapsed increments
    lagging = IncrementalRollup(
        spark, t, str(tmp_path / "r2"),
        keys=["partition_date"], aggs={"n": ("count",)},
    )
    with pytest.raises(ValueError, match="compaction"):
        lagging.fold()

    # rebaseline() is the recovery operator the loud failure points at:
    # re-anchor at the marker via a snapshot read + full aggregate …
    st = lagging.rebaseline()
    assert st["last_batch"] == 2  # the compaction marker
    got = {tuple(r) for r in lagging.read().collect()}
    want = {
        tuple(r)
        for r in lagging.recompute()
        .collect()
    }
    # marker = 2, batch 3 arrived after: rebaseline holds state ≤ marker
    assert {str(r[0]) for r in got} == {"2024-03-01"}
    # … and folds resume incrementally from there
    lagging.fold()
    got = {tuple(r) for r in lagging.read().collect()}
    assert got == want and got
    # a second rebaseline with nothing to recover is a no-op
    st2 = lagging.rebaseline()
    assert st2["version"] == lagging.state()["version"]


def test_rollup_sweep_keeps_one_superseded_version(spark, tmp_path):
    """A reader that resolved state() just before a fold must still be
    able to scan the version it resolved: installing v{n+1} keeps v{n}
    and deletes only v{n-1} and older."""
    t = str(tmp_path / "t")
    ru = _rollup(spark, tmp_path)
    for b in range(3):
        write_partitioned_batch(
            _batch(spark, [(b, "2024-03-01", "a", float(b))]), t, b
        )
        ru.fold(until_batch=b)

    def versions():
        return sorted(
            d for d, is_dir in ru.fs.list_entries(str(tmp_path / "r"))
            if is_dir and d.startswith("v")
        )

    assert ru.state()["version"] == 3
    assert versions() == ["v2", "v3"]  # one superseded kept, v1 swept
    # the kept superseded version is still a readable complete rollup
    assert spark.read.parquet(str(tmp_path / "r" / "v2")).count() > 0


def test_rollup_before_first_ingest_is_guarded(spark, tmp_path):
    """Before the base table's first batch exists, fold() is a no-op
    and read() raises a targeted error instead of a path-not-found from
    deep inside the change-feed reader."""
    ru = _rollup(spark, tmp_path)  # tmp_path/"t" never written
    st = ru.fold()
    assert (st["version"], st["folded_batches"]) == (0, 0)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        ru.read()
    # first ingest unblocks both
    write_partitioned_batch(
        _batch(spark, [(1, "2024-03-01", "a", 1.0)]), str(tmp_path / "t"), 0
    )
    assert ru.fold()["version"] == 1
    assert ru.read().count() == 1


def test_rollup_rejects_non_decomposable_aggs(spark, tmp_path):
    with pytest.raises(ValueError, match="not decomposable"):
        IncrementalRollup(
            spark, str(tmp_path / "t"), str(tmp_path / "r"),
            keys=["k"], aggs={"p": ("percentile", "v")},
        )


def test_run_rollup_cli_fold_and_rebaseline(spark, tmp_path, capsys):
    """The maintenance CLI covers the rollup like run_compact covers
    compaction: fold increments, point at the rebaseline recovery when
    behind the marker, and refresh after rebaselining."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.cli import (
        run_rollup,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.compact import (
        compact_table,
    )

    wh = tmp_path / "wh"
    t = str(wh / "transfers")
    for b in range(2):
        write_partitioned_batch(
            _batch(spark, [(b, "2024-03-01", "a", float(b))]), t, b
        )
    (wh / "transfers" / "_ledger.json").write_text(json.dumps([0, 1]))
    base = [
        "--warehouse", str(wh), "--table", "transfers",
        "--rollup-dir", str(tmp_path / "r"),
        "--keys", "partition_date",
        "--agg", "n=count", "--agg", "sv=sum:value",
        "--decimal-sums",
        "--lock-path", str(tmp_path / "lock"),
    ]
    run_rollup.main(base)
    assert "folded" in capsys.readouterr().out

    # fall behind: new ingest + compaction while the rollup sleeps,
    # then the fold fails with the rebaseline hint
    lagging = base[:5] + [str(tmp_path / "r2")] + base[6:]
    write_partitioned_batch(
        _batch(spark, [(9, "2024-03-02", "b", 9.0)]), t, 2
    )
    (wh / "transfers" / "_ledger.json").write_text(json.dumps([0, 1, 2]))
    compact_table(spark, t)
    with pytest.raises(SystemExit, match="rebaseline"):
        run_rollup.main(lagging)
    run_rollup.main(lagging + ["--rebaseline", "--show", "5"])
    out = capsys.readouterr().out
    assert "rebaselined" in out and "2024-03-02" in out

    # malformed agg specs die in argparse, not deep in Spark
    with pytest.raises(SystemExit):
        run_rollup.main(base[:-4] + ["--agg", "n=wat"])


def test_parse_agg_is_cold_process_safe():
    """--decimal-sums must be usable from a COLD CLI process: argument
    parsing happens before get_spark_session, and building a Column
    there raises a bare AssertionError with no active SparkContext.
    parse_agg therefore stays symbolic; _resolve_aggs materializes the
    decimal cast only inside the session block."""
    import subprocess
    import sys

    code = (
        "from development_of_a_streaming_pipeline_to_ingest_dcache_billing"
        "_data_to_hive_hdfs_spark.cli.run_rollup import parse_agg\n"
        "name, spec = parse_agg('sv=sum:value', True)\n"
        "assert name == 'sv' and spec == ('sum', 'value', 'decimal'), spec\n"
        "assert parse_agg('n=count', True) == ('n', ('count',))\n"
        "print('COLD-PARSE-OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "COLD-PARSE-OK" in out.stdout


def test_resolve_aggs_builds_decimal_cast_with_session(spark):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.cli.run_rollup import (
        _resolve_aggs,
        parse_agg,
    )

    aggs = dict(
        parse_agg(s, True) for s in ("n=count", "sv=sum:value", "mx=max:value")
    )
    resolved = _resolve_aggs(aggs)
    assert resolved["n"] == ("count",)
    assert resolved["mx"] == ("max", "value")
    kind, col = resolved["sv"]
    assert kind == "sum"
    df = spark.createDataFrame([(1.5,)], ["value"]).select(col.alias("c"))
    assert df.schema["c"].dataType.simpleString() == "decimal(28,10)"
