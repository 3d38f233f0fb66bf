from .catalog import BENCH_EXTRA, ORACLES, QUERIES, flagship

__all__ = ["BENCH_EXTRA", "ORACLES", "QUERIES", "flagship"]
