"""CCNet-style boilerplate line removal (operators.textops.
boilerplate_lines / strip_boilerplate_lines): exact removal semantics,
group isolation, structure preservation, broadcast gate, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    boilerplate_lines,
    strip_boilerplate_lines,
)

ROWS = [
    (0, "a", "NAV BAR\n\nunique zero\n(c) site a"),
    (1, "a", "NAV BAR\nunique one\n\n(c) site a"),
    (2, "a", "totally unique\nno shared lines here"),
    (3, "b", "NAV BAR\nunique three\n(c) site b"),
]
SCHEMA = "doc_id long, source string, text string"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_frequent_line_table(spark):
    got = {
        (r["source"], r["n_docs"])
        for r in boilerplate_lines(_df(spark)).collect()
    }
    # group a: "NAV BAR" and "(c) site a", both in 2 docs; group b: none
    assert got == {("a", 2), ("a", 2)} or got == {("a", 2)}
    assert boilerplate_lines(_df(spark)).count() == 2


def test_strip_semantics_exact(spark):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(_df(spark)).collect()
    }
    # boilerplate removed, blank lines and order preserved
    assert out[0]["text"] == "\nunique zero"
    assert out[1]["text"] == "unique one\n"
    assert (out[0]["n_lines_removed"], out[0]["n_lines_kept"]) == (2, 2)
    # unique doc untouched
    assert out[2]["text"] == ROWS[2][2]
    assert out[2]["n_lines_removed"] == 0
    # group b: "NAV BAR" appears in only ONE doc there -> kept
    assert out[3]["text"] == ROWS[3][2]


def test_min_docs_threshold(spark):
    out = strip_boilerplate_lines(_df(spark), min_docs=3)
    assert {r["n_lines_removed"] for r in out.collect()} == {0}


def test_whitespace_only_lines_never_removed(spark):
    rows = [(i, "s", "   \nkeep me " + str(i) + "\n   ") for i in range(3)]
    out = strip_boilerplate_lines(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    for r in out:
        assert r["text"].startswith("   \n") and r["text"].endswith("\n   ")
        assert r["n_lines_removed"] == 0


def test_passthrough_columns_and_rowcount(spark):
    df = _df(spark).withColumn("lang", F.lit("en"))
    out = strip_boilerplate_lines(df)
    assert out.count() == len(ROWS)
    assert set(out.columns) == {
        "doc_id", "source", "lang", "text",
        "n_lines_removed", "n_lines_kept",
    }
    assert {r["lang"] for r in out.collect()} == {"en"}


def test_repeated_line_within_single_doc_not_boilerplate(spark):
    # the same line twice in ONE doc is repetition, not cross-doc
    # boilerplate: distinct-doc counting must not promote it
    rows = [(0, "s", "echo\necho\nbody"), (1, "s", "other\nlines")]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out[0]["text"] == "echo\necho\nbody"
    assert out[0]["n_lines_removed"] == 0


def test_broadcast_gate(spark):
    """Fingerprint sets broadcast only under the gate budget; over it,
    fall back to the planner's join. Identical output. The over-budget
    leg uses a tiny POSITIVE threshold — a disabled (≤ 0) threshold
    now falls back to the 10 MB default budget (r15 advice)."""

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    df = _df(spark)
    small = strip_boilerplate_lines(df)
    assert "BroadcastHashJoin" in plan(small)

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        large = strip_boilerplate_lines(df)
        p = plan(large)
        assert "BroadcastHashJoin" not in p, p
        assert {tuple(r) for r in large.collect()} == {
            tuple(r) for r in small.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
