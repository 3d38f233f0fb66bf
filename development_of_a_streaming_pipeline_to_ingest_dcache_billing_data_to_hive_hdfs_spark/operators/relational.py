"""Relational operators Spark lacks as single calls, composed from
DataFrame primitives (SURVEY §2.4). Everything stays JVM-side — no Python
in the row path — so whole-stage codegen applies and the ops scale with
ordinary shuffle tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number window — the scalable pattern
    (single shuffle on the group key; no global sort)."""
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a hot key: the skewed side gets a random
    salt in [0, salt_buckets); the other side is replicated once per
    salt value (explode of a literal range). The hot key's rows then
    spread over ``salt_buckets`` shuffle partitions instead of one
    straggler task.

    AQE's skew-join split (enabled in the session factory) handles most
    cases at runtime; explicit salting remains the tool when a single
    key exceeds what partition-splitting can fix (e.g. one key = 30% of
    the table) or when AQE is unavailable (streaming micro-batches).
    Salt = (content-hash + row-offset round-robin) mod salt_buckets:
    the row-offset term spreads even a hot key whose rows are EXACT
    duplicates (common in dedup-free ingest, the very workload salting
    targets — a pure content-hash salt lands every duplicate in ONE
    bucket and reintroduces the straggler), while the key-hash term
    keeps the salt content-anchored and retry-stable on scan inputs.
    No RNG in the plan: rand() would break replay/retry determinism
    outright.

    ``how`` is restricted to joins where replicating the ``other`` side
    is sound: inner/left/left_semi/left_anti drop (or never emit) the
    replicated side's unmatched rows, so the ``salt_buckets``-fold copy
    is invisible. right/full/left_outer-of-the-replicated-side would
    surface each unmatched ``other`` row once per salt bucket.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r} — "
            "the replicated build side would duplicate its unmatched rows "
            "once per salt bucket under right/full outer joins"
        )
    # key-hash term: stable per row across retries for scan inputs (and
    # hashing ONLY the key — not every column — stays cheap on wide rows
    # and never hits xxhash64's MapType restriction); row-offset term:
    # spreads byte-identical duplicate rows. Both terms reduce mod
    # buckets BEFORE adding (their raw sum could overflow a long, which
    # throws under ANSI mode). For shuffle-derived inputs the offset
    # term's order-stability relies on Spark's indeterminate-stage
    # rollback (fetch failures re-run the whole consumer stage).
    b = F.lit(salt_buckets)
    salt = F.pmod(
        F.pmod(F.xxhash64(F.col(on)), b)
        + F.pmod(F.monotonically_increasing_id(), b),
        b,
    )
    lhs = skewed.withColumn("_salt", salt.cast("int"))
    rhs = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = lhs.join(rhs, [on, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join (backward): for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Implementation is the union-tag-window pattern, NOT a range cross
    join: both sides are tagged and unioned, then one window sorted by
    (key, ts) carries the last-seen right values forward onto left rows
    (``last(..., ignorenulls=True)``). Cost: one shuffle on the key +
    one sort — survives 100× scale-up where a theta join explodes.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt_cols = [F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols
    ]
    rt = right.select(*rt_cols)
    for c in left.columns:
        if c not in (on,):
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = lt.select(rt.columns).unionByName(rt.select(rt.columns))
    # right rows sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}_f")
            for c in right_cols
        ],
    )
    out = filled.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"{c}{suffix}_f", f"{c}{suffix}")
    return out.drop("_side", "_ts")
