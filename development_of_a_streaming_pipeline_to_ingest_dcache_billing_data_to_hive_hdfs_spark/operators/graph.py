"""Iterative graph algorithms over edge-list DataFrames.

PageRank is the second iterative graph op beside ``dedup``'s
pointer-jumping connected components, and follows the same execution
discipline: a driver loop of a FIXED number of rounds, each round one
keyed aggregation, with ``localCheckpoint()`` truncating the lineage so
round k's plan doesn't embed rounds 0..k−1 (10 nested shuffles deep, the
optimizer re-plans the whole history every action otherwise).

Shape at 100 TB: ranks and contributions shuffle on the node key every
round — that IS PageRank's data movement; the wins available are (a)
static inputs (``edges``, the node/degree base) checkpointed ONCE and
reused, (b) dangling-node mass riding each round's OWN checkpoint job
as an ``Observation`` metric (r17: the previous broadcast 1-row
aggregate was a per-round subtree — one extra scan of the rank
checkpoint, one extra broadcast build, and a crossJoin in every
round's plan, measured 7 jobs/round at sf0.1; the observed sum is the
same float aggregation over the same checkpointed rows, injected into
the next round as a plan literal), (c) fixed iteration count rather
than a convergence test (a convergence check costs an extra action
per round; production runs fix iters and monitor the delta offline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (parallel
    edges count as repeated links; the node set is src ∪ dst).

    r₀(v) = 1/N;  r_{k+1}(v) = (1−d)/N + d·(Σ_{u→v} r_k(u)/deg(u) + D_k/N)

    where D_k is the total rank mass sitting on DANGLING nodes (no
    out-edges) — redistributed uniformly, so Σ_v r(v) = 1 exactly at
    every round (asserted in tests; dropping dangling mass is the
    classic PageRank bug that silently deflates every score).

    Returns ``(node, rank)`` with full-precision doubles; callers
    round/scale for presentation. ``iters`` is fixed by design (see
    module docstring)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    src, dst = F.col(src_col), F.col(dst_col)
    e = edges.select(src.alias("src"), dst.alias("dst")).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # static per-node base: (node, out_deg NULL for dangling, n_nodes)
    base = (
        nodes.join(deg, "node", "left")
        .crossJoin(F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n"))))
        .localCheckpoint()
    )
    ranks = base.select(
        "node", "out_deg", "n", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    d = F.lit(damping)
    # dangling mass D_k = Σ rank over out_deg-NULL nodes. Round 0's is
    # the one explicit aggregate (over the initial uniform ranks, read
    # from the base checkpoint); every later round's rides that round's
    # OWN checkpoint job as an Observation metric — the identical sum
    # over the identical checkpointed rows, without the per-round
    # scan + broadcast-build subtree the crossJoin formulation paid.
    # The driver-side float then re-enters round k+1 as a literal: a
    # double survives the py4j round trip exactly, so the rank
    # expression computes on the same value the column did.
    d_mass = (
        ranks.where(F.col("out_deg").isNull())
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d_mass"))
        .first()["d_mass"]
    )
    for _ in range(iters):
        contrib = (
            ranks.where(F.col("out_deg").isNotNull())
            .join(e, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inflow"))
        )
        obs = Observation()
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                "n",
                (
                    (F.lit(1.0) - d) / F.col("n")
                    + d
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(d_mass) / F.col("n")
                    )
                ).alias("rank"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("out_deg").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("d_mass"),
            )
            .localCheckpoint()
        )
        # blocks only on the listener callback — the checkpoint action
        # itself already ran eagerly on the line above
        d_mass = obs.get["d_mass"]
    return ranks.select("node", "rank")
