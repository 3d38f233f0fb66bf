"""Data-profiling / data-quality operators: one-pass column profiles,
per-group z-score anomaly flags, fixed-width histograms, winsorized
(percentile-clipped) robust statistics.

The reference pipeline ships raw billing rows into Hive with no
profiling surface at all (`/root/reference/Dcache_kafka_to_hive.py`
writes and compacts, nothing reads back for quality); an operator the
size of this warehouse needs first-class "is the data sane" queries.
Everything here is JVM-side (codegen'd built-ins, no Python in the hot
path) and shaped for the 100 TB case:

- ``profile_numeric``: ONE scan for all columns. Exact multi-column
  ``count(distinct)`` compiles to Spark's Expand + two-phase aggregate
  (the input is replicated once per profiled column before the partial
  agg — len(cols)× the shuffle bytes). That is the standard exact
  plan; for wide profiles at the 100 TB end pass ``approx=True`` and
  the distinct counts become HyperLogLog sketches (no Expand, one
  ordinary partial agg) at ±2-3 % error.
- ``group_zscore_anomalies``: per-key moments are a tiny aggregate
  (keyed by the group column, two-phase, map-side partials), then a
  **broadcast** join back onto the fact — the fact table never
  shuffles. A window over the key would shuffle 100 % of rows on a
  low-cardinality, likely-skewed key; the stats-join shape reads the
  fact twice but both reads are columnar scans with pushdown.
- ``fixed_width_histogram``: bucket id is a per-row arithmetic
  expression (scan-stage), then one shuffle on the small bucket key.
- ``winsorized_stats``: exact per-group percentiles (Spark's
  ``percentile``) buffer each group's values — fine per-group up to
  ~10^8 rows, and bit-comparable to the DuckDB oracle; at the 100 TB
  end pass ``exact=False`` for ``approx_percentile`` (GK sketch,
  bounded memory, mergeable partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Long-format profile of numeric columns in ONE scan: for each
    column a row (column_name, n_rows, n_nulls, n_distinct, min_v,
    max_v, mean_v). ``approx=True`` swaps exact distinct counts for
    HyperLogLog sketches (drops the Expand replication — the 100 TB
    path)."""
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            F.avg(F.col(c).cast("double")).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)  # single row; everything after is driver-free but trivial
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("bigint").alias("n_nulls"),
                F.col(f"{c}__nd").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
                F.round(F.col(f"{c}__mean"), 4).alias("mean_v"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")


def group_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows of ``df`` with ``z`` (standard score of ``value_col`` within
    its ``key_col`` group) and ``is_anomaly`` (|z| > threshold)
    attached. Group moments are a small two-phase aggregate broadcast
    back onto the fact — the fact rows never shuffle. Groups with <2
    rows or zero spread yield z = NULL / is_anomaly = false. The join
    is null-safe: rows with a NULL group key (exactly the malformed
    rows a quality screen must surface) stay in the output as their
    own group instead of being dropped by inner-join semantics."""
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("__mean"),
        F.stddev_samp(value_col).alias("__sd"),
    ).withColumnRenamed(key_col, "__key")
    z = F.when(
        F.col("__sd").isNotNull() & (F.col("__sd") > 0),
        (F.col(value_col) - F.col("__mean")) / F.col("__sd"),
    )
    return (
        df.join(
            F.broadcast(stats), F.col(key_col).eqNullSafe(F.col("__key"))
        )
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False)),
        )
        .drop("__key", "__mean", "__sd")
    )


def fixed_width_histogram(
    df: DataFrame, col: str, width: float, min_edge: float = 0.0
) -> DataFrame:
    """Equi-width histogram: (bucket, lo_edge, hi_edge, cnt), bucket =
    floor((col - min_edge) / width). The bucket id is a scan-stage
    per-row expression; the only shuffle is the groupBy on the small
    bucket key. NULL values are excluded (no bucket)."""
    bucket = F.floor((F.col(col) - F.lit(min_edge)) / F.lit(width)).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            (F.lit(min_edge) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            (F.lit(min_edge) + (F.col("bucket") + 1) * F.lit(width)).alias("hi_edge"),
            "cnt",
        )
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    exact: bool = True,
) -> DataFrame:
    """Per-group winsorized mean: values are clipped to the group's
    [lo, hi] percentiles before averaging, making the mean robust to
    tail outliers. Exact ``percentile`` (linear interpolation at rank
    p*(n-1) — DuckDB ``quantile_cont`` semantics) buffers each group;
    ``exact=False`` switches to the mergeable GK sketch
    (``approx_percentile``) for the 100 TB path. Output: key, n,
    p_lo, p_hi, winsorized_mean, raw_mean."""
    pct = F.approx_percentile if not exact else F.percentile
    stats = df.groupBy(key_col).agg(
        pct(F.col(value_col), F.lit(float(lo))).alias("p_lo"),
        pct(F.col(value_col), F.lit(float(hi))).alias("p_hi"),
    ).withColumnRenamed(key_col, "__key")
    # least/greatest SKIP nulls (Postgres semantics in both Spark and
    # DuckDB), which would silently impute p_lo for NULL values — guard
    # so NULLs stay NULL and drop out of the mean on both engines
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")),
    )
    return (
        df.join(
            F.broadcast(stats), F.col(key_col).eqNullSafe(F.col("__key"))
        )
        .drop("__key")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("p_lo"), 4).alias("p_lo"),
            F.round(F.first("p_hi"), 4).alias("p_hi"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.avg(value_col), 4).alias("raw_mean"),
        )
    )


def key_skew_profile(
    df: DataFrame, key_col: str, *, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnostic: the heaviest ``top_n`` keys with
    exact counts, row share, cumulative share, and the ratio to the
    MEDIAN group size — the numbers that predict a shuffle-partition
    blowout BEFORE a 100 TB join runs, and that size the salt factor
    for ``relational.salted_join`` (a key at 1000× median needs ~1000
    salts to flatten; share_pct bounds how much of the corpus the
    hot-key replication touches).

    Plan shape: one keyed aggregate with map-side partials (|keys|
    rows), a global top-N (TakeOrderedAndProject — never a full sort),
    a 1-row stats aggregate broadcast back, and a window over only the
    top_n survivors. The fact table is scanned once; nothing bigger
    than |keys| rows ever shuffles. Output: rank, key (string-cast for
    portability), n_rows, share_pct, cum_share_pct, x_median.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.percentile(F.col("n_rows"), F.lit(0.5)).alias("__med"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(w).alias("rank"),
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total") * 100, 4).alias(
                "share_pct"
            ),
            F.round(
                F.sum("n_rows").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("__total")
                * 100,
                4,
            ).alias("cum_share_pct"),
            F.round(F.col("n_rows") / F.col("__med"), 4).alias("x_median"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between a REFERENCE snapshot of a
    numeric column and its CURRENT distribution — the standard
    production drift monitor (rule of thumb: <0.1 stable, 0.1–0.25
    shifting, >0.25 drifted; per-bin terms show WHERE it moved).

    Equal-width bins over [lo, hi] (probed from the reference's
    min/max when not given — two bounded 1-row aggregates); values
    outside clamp to the edge bins, so new out-of-range mass is VISIBLE
    drift, not silently dropped. Counts are Laplace-smoothed (+1 per
    bin) before the share ratio so an empty bin contributes a finite
    term instead of ±inf.

    Output: one row per bin —
    ``(bin, n_ref, n_cur, psi_term)`` with exact bigint counts and the
    4-dp term ``(q − p)·ln(q/p)`` (q = cur share, p = ref share); sum
    the terms for the index. Bin assignment and the term are built from
    +,−,/,floor,ln on doubles — the identical expression replays in the
    DuckDB oracle bit-for-bit, so even the bin EDGES are engine-exact.

    Shape at 100 TB: two corpus scans (ref and cur), each collapsing
    map-side into ≤``bins`` partial counts; a ≤bins-row outer join; a
    broadcast totals row. Nothing corpus-sized ever shuffles."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2: {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass lo and hi together, or neither")
    if lo is None:
        edge = ref.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).collect()[0]
        if edge.lo is None:
            raise ValueError("reference has no non-NULL values to bin")
        lo, hi = float(edge.lo), float(edge.hi)
    if not hi > lo:
        raise ValueError(f"need hi > lo: [{lo}, {hi}]")
    width = (hi - lo) / bins

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1)).cast("bigint")
        return (
            df.where(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    joined = r.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
        )
    )
    p = (F.col("n_ref") + 1) / (F.col("t_ref") + F.lit(bins))
    q = (F.col("n_cur") + 1) / (F.col("t_cur") + F.lit(bins))
    return joined.crossJoin(totals).select(
        "bin",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round((q - p) * F.log(q / p), 4).alias("psi_term"),
    )


def psi_drift_categorical(
    ref: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """PSI over a CATEGORICAL column (event types, languages, sources):
    one row per category seen in EITHER snapshot — a category that
    appears or vanishes outright contributes its full smoothed term
    instead of being dropped (that appearance/disappearance IS the
    drift). Same smoothing and portable arithmetic as
    :func:`psi_drift`; the category domain is assumed
    aggregation-sized (it is the groupBy key)."""
    r = (
        ref.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    c = (
        cur.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    joined = r.join(c, "category", "full_outer").select(
        "category",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("n_ref").alias("t_ref"),
            F.sum("n_cur").alias("t_cur"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    p = (F.col("n_ref") + 1) / (F.col("t_ref") + F.col("k"))
    q = (F.col("n_cur") + 1) / (F.col("t_cur") + F.col("k"))
    return joined.crossJoin(totals).select(
        "category",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round((q - p) * F.log(q / p), 4).alias("psi_term"),
    )
