"""msgType routing: parsed billing frame → per-table frames + rejects.

Reference parity: ≙ the four ``insert*`` functions
(`Dcache_kafka_to_hive.py:115-141`) which each filter one msgType and
select that table's columns. Two deliberate upgrades (SURVEY §1.3, §3.4):

- A **rejects route**: records whose msgType matches no table, or whose
  JSON failed to parse, are returned instead of silently dropped (the
  reference loses them — each INSERT filters a specific msgType and
  nothing catches the rest).
- Routing is a plain column predicate over ONE parsed DataFrame; callers
  persist the parsed batch once and run all route writes from it (the
  reference re-parses the batch per table, 4× work — SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parse import CORRUPT_FIELD
from .schema import MSG_TYPE_ROUTES, PARTITION_FIELD, REJECTS_ROUTE, ROUTE_COLUMNS


def route_predicate(route: str):
    """Column predicate selecting the msgTypes of one route."""
    types = [m for m, r in MSG_TYPE_ROUTES.items() if r == route]
    return F.col("msgType").isin(types)


def route(parsed: DataFrame) -> dict[str, DataFrame]:
    """Split a parsed billing frame into
    {transfers, requests, storage, removes, rejects}.

    Each route frame carries its contract columns (ROUTE_COLUMNS order,
    positional-insert safe) + partition_date. The rejects frame keeps
    everything, including the raw value for corrupt rows.
    """
    out: dict[str, DataFrame] = {}
    for name in ("transfers", "requests", "storage", "removes"):
        # corrupt rows are excluded even when msgType parsed — a record
        # with any malformed field goes whole to rejects, never to both
        out[name] = parsed.where(
            route_predicate(name) & F.col(CORRUPT_FIELD).isNull()
        ).select(*ROUTE_COLUMNS[name], PARTITION_FIELD)
    known = list(MSG_TYPE_ROUTES)
    out[REJECTS_ROUTE] = parsed.where(
        (~F.col("msgType").isin(known))
        | F.col("msgType").isNull()
        | F.col(CORRUPT_FIELD).isNotNull()
    )
    return out
