"""PySpark-native analytics engine with the capabilities of the reference
dCache-billing streaming pipeline (see /root/repo/SURVEY.md).

Spark-first re-expression — NOT a port. The reference
(`Dcache_kafka_to_hive.py`) is a Kafka→parse→route→Hive-partitioned-Parquet
micro-batch pipeline; this package expresses the same semantics with
idiomatic Structured Streaming / DataFrame API, then widens to the full
relational query surface and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for the
100 TB scale point.

Layout:
  session         SparkSession factory (≙ Dcache_kafka_to_hive.py:41-53)
  schema          single source-of-truth billing StructType (≙ :29-36 + :162-262)
  parse           from_json parse + flatten + typed casts (≙ :56-96)
  route           msgType router incl. rejects path (≙ :115-141)
  sink            partitioned Parquet sink, idempotent per-batch writes (≙ :115-141)
  compact         partition compaction (≙ :354-385, bugs fixed)
  sources/        batch/stream source abstraction (file for tests, Kafka opts kept)
  streaming/      foreachBatch router, event-time windows, watermarks
  operators/      relational surface + dedup/similarity/text/multimodal ops
  functions/      scalar helpers shared across operators
  plans/          query catalog: (spark_fn, oracle_sql) pairs for the driver
  cli/            lock-file wrapped entry points (≙ run_kafka_to_hive.py)
"""

from .session import get_spark_session

__all__ = ["get_spark_session"]
