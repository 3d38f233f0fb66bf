"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship billing-core query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (and
the §2.4/§7 capability extensions); ``oracle_sql()`` gives each one a
DuckDB-runnable ANSI-SQL twin where the semantics are SQL-expressible
(engine-specific ops — minhash/simhash/LSH/HLL — are rows-only checks by
design; their accuracy is pytest-verified in tests/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    ORACLES,
    QUERIES,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver
    priority order (the correctness driver verifies the FIRST 50 — the
    rotation is computed lazily, so trigger it before snapshotting)."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
        catalog,
    )

    catalog.ensure_driver_order()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
