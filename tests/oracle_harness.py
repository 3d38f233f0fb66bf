"""Local mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle, compare row count + column names + an
order-insensitive value representation (SURVEY §5.1)."""

from __future__ import annotations

import math
import os

import duckdb

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    ORACLES,
    QUERIES,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.tables import (
    TABLES,
)


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # sign-of-zero STRICT: the driver's value hash distinguishes
            # -0.0 from +0.0 (it split q_llm_jl_projection /
            # q_llm_weighted_sample in r8 while this canon collapsed
            # both to "0" and the local sweep stayed green). A weaker
            # local harness than the driver is a blind spot, never a
            # convenience.
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare_one(spark, con, name: str, sf_dir: str) -> dict:
    sdf = QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()
    result = {"name": name, "spark_rows": len(spdf)}
    if name not in ORACLES:
        result["mode"] = "rows_only"
        result["ok"] = len(spdf) >= 0
        return result
    opdf = con.execute(ORACLES[name]).df()
    result["mode"] = "oracle"
    result["oracle_rows"] = len(opdf)
    cols_ok = sorted(map(str.lower, spdf.columns)) == sorted(map(str.lower, opdf.columns))
    rows_ok = False
    mismatch = None
    if cols_ok and len(spdf) == len(opdf):
        s_rows, o_rows = canonical_rows(spdf), canonical_rows(opdf)
        rows_ok = s_rows == o_rows
        if not rows_ok:
            diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            mismatch = diff
    result["cols_ok"] = cols_ok
    result["ok"] = cols_ok and len(spdf) == len(opdf) and rows_ok
    if mismatch:
        result["sample_diff"] = mismatch
    if not cols_ok:
        result["spark_cols"] = sorted(spdf.columns)
        result["oracle_cols"] = sorted(opdf.columns)
    return result


def compare_all(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    con = duck_connection(sf_dir)
    results = {}
    for name in names or QUERIES:
        try:
            results[name] = compare_one(spark, con, name, sf_dir)
        except Exception as e:  # pragma: no cover - diagnostic path
            results[name] = {"name": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
    return results
