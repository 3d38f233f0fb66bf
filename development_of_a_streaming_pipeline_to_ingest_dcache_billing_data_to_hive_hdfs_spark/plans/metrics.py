"""Measured execution metrics for a DataFrame's last run: walk the
AQE-final physical plan and aggregate the SQLMetric values Spark
accumulated while executing it — shuffle bytes actually written, spill,
files-scan bytes, broadcast sizes. 'Measure, don't guess': a plan that
LOOKS right can still shuffle 10× what it should; these are the
numbers the plan audit (PLANS.md) quotes per query, and the check that
an operator's claimed shape (one shuffle, gates-before-exchange,
broadcast-not-shuffle) is what the engine really did.

Driver-side and bounded: the walk touches plan nodes (O(operators)),
never data. Works in local and cluster mode alike — SQLMetrics are
driver accumulators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _node_metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _walk(node, visit) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), visit)
        return
    if cls.startswith("Reused"):  # ReusedExchange / ReusedSubquery
        return  # their metrics belong to the original node
    visit(node, cls)
    # subquery fragments (scalar/IN subqueries not rewritten to joins,
    # dynamic-pruning subqueries) hang off expressions, not children —
    # missing them undercounts exactly the hidden extra scans/exchanges
    # this walk exists to expose
    try:
        sq = node.subqueries()
        for i in range(sq.size()):
            _walk(sq.apply(i), visit)
    except Exception:  # noqa: BLE001 — plan nodes without the method
        pass
    if "QueryStageExec" in cls or "QueryStage" in cls:
        _walk(node.plan(), visit)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), visit)


def collect_plan_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate executed-plan metrics of ``df``'s LAST execution (run
    an action first; a never-executed plan reports zeros). Keys:
    shuffle_bytes_written / shuffle_records / spill_bytes /
    scan_bytes / scan_files / broadcast_bytes / broadcast_rows /
    n_exchanges / n_broadcasts."""
    agg = {
        "shuffle_bytes_written": 0,
        "shuffle_records": 0,
        "spill_bytes": 0,
        "scan_bytes": 0,
        "scan_files": 0,
        "broadcast_bytes": 0,
        "broadcast_rows": 0,
        "n_exchanges": 0,
        "n_broadcasts": 0,
    }

    def visit(node, cls):
        m = _node_metrics(node)
        if cls == "ShuffleExchangeExec":
            agg["n_exchanges"] += 1
            agg["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
            agg["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
        elif cls == "BroadcastExchangeExec":
            agg["n_broadcasts"] += 1
            # dataSize is the in-memory hashed-relation footprint, which
            # includes its page allocation (min one 64 MB page in this
            # config) — a 5-row broadcast reports ~64 MB. Read it as
            # memory pressure, not wire bytes; broadcast_rows is the
            # honest volume signal.
            agg["broadcast_bytes"] += m.get("dataSize", 0)
            agg["broadcast_rows"] += m.get("numOutputRows", 0)
        elif "FileSourceScan" in cls or "BatchScan" in cls:
            agg["scan_bytes"] += m.get("filesSize", m.get("size of files read", 0))
            agg["scan_files"] += m.get("numFiles", 0)
        agg["spill_bytes"] += m.get("spillSize", 0)

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    return agg


def run_with_metrics(df: DataFrame) -> dict[str, int]:
    """Fully evaluate ``df`` and return its measured metrics. The
    evaluation must drive ``df``'s OWN QueryExecution (a noop write
    compiles a separate one whose metrics the walk can't see), so it
    counts the plan's InternalRow RDD — every output column is
    materialized, nothing is transferred to the driver."""
    df._jdf.queryExecution().toRdd().count()
    return collect_plan_metrics(df)
