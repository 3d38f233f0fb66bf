"""Whole-catalog physical-plan audit for AQE-masked scale defects.

Motivated by the r12 finding that produced commit "Broadcast the PQ
rerank shortlist": a small derived frame joined without a broadcast
hint plans as SortMergeJoin initially, shuffling the BIG side in full;
AQE converts the join to broadcast only AFTER that exchange
materializes, so executed-plan tests at test SF see a healthy
BroadcastHashJoin and the defect ships. The probe signature in the
FINAL adaptive plan is a BroadcastExchange sitting directly on top of
a ShuffleQueryStage.

This script runs every catalog + bench query at sf0.01 and flags:

1. ``bcast-over-shuffle`` — BroadcastExchange whose immediate subtree
   contains an ``Exchange hashpartitioning``. MOSTLY BENIGN: the
   canonical two-phase-aggregate-then-broadcast pattern (map-side
   partials -> bounded group exchange -> final agg -> broadcast) has
   exactly this shape, and the sub-exchange is bounded by group count.
   A REAL defect feeds the broadcast from a corpus-scale raw subtree
   (Sort/Project over a big scan) — the r12 rerank bug. Triage each
   hit by reading what sits under the BroadcastExchange.
2. ``single-partition`` — ``Exchange SinglePartition`` funnels. Benign
   when the input is a scalar/1-row aggregate or a dim-cardinality
   frame a global window deliberately consumes (e.g. Q15's documented
   supplier-level max); a defect when fact-scale rows funnel.

r12 sweep result (all 174 queries): one genuine defect (the PQ rerank,
fixed + pinned by test_pq_rerank_broadcasts_shortlist_in_initial_plan);
every other bcast-over-shuffle hit was the bounded-aggregate pattern
(contamination probe ngram set, blocklist domain set, dedup fp store
screen, rare-token vocab model, temperature mixture source weights,
tf/df models, correlated-subquery per-key aggregates, event-anomaly
per-type stats, Q20 part-quantity aggregates, recursive-CTE frontier,
winsorized percentile bounds) and every single-partition hit was a
scalar aggregate, a bounded ECDF/recall audit frame, or a documented
dim-scale global window. An unbounded-side broadcast that AQE picked
adaptively at small SF (e.g. tfidf's corpus-sized tf frame) is NOT a
defect: there is no hint forcing it, and at scale the planner reverts
to the declared shuffle join.

Usage: python scripts/audit_plan_shapes.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark import (
        get_spark_session,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        BENCH_EXTRA,
        QUERIES,
    )

    spark = get_spark_session(
        app_name="plan-audit", master="local[16]", shuffle_partitions=16
    )
    all_queries = {**QUERIES, **BENCH_EXTRA}
    flags: dict[str, list[str]] = {}
    for name, fn in all_queries.items():
        try:
            df = fn(spark, sf_dir)
            df._jdf.queryExecution().toRdd().count()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            flags[name] = [f"ERR {type(exc).__name__}: {str(exc)[:80]}"]
            continue
        # final adaptive plan only — the trailing "Initial Plan" echo
        # would double-count and show pre-conversion shapes
        final = plan.split("== Initial Plan ==")[0]
        lines = final.splitlines()
        hits = []

        def node_depth(line: str) -> int:
            # tree depth = column of the '+- ' node marker; leading
            # whitespace alone under-counts lines prefixed with the
            # ':' sibling glyphs (r12 review)
            i = line.find("+- ")
            return i if i >= 0 else -1

        for i, ln in enumerate(lines):
            if "BroadcastExchange" in ln and "Ident" not in ln:
                depth = node_depth(ln)
                for j in range(i + 1, min(i + 13, len(lines))):
                    nxt = lines[j]
                    d2 = node_depth(nxt)
                    if d2 >= 0 and d2 <= depth:
                        break  # left the BroadcastExchange subtree
                    if "Exchange hashpartitioning" in nxt:
                        under = lines[i + 1].strip()[:60]
                        hits.append(f"bcast-over-shuffle[{under}]")
                        break
        n_single = final.count("Exchange SinglePartition")
        if n_single:
            hits.append(f"single-partition x{n_single}")
        if hits:
            flags[name] = hits
    print("=== AUDIT RESULTS (triage each hit — see module docstring) ===")
    for k, v in sorted(flags.items()):
        print(k, "|", "; ".join(v))
    print(f"=== {len(flags)} flagged of {len(all_queries)} ===")
    spark.stop()


if __name__ == "__main__":
    main()
