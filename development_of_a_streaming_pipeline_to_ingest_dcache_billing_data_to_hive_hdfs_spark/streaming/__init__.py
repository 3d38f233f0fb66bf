from .pipeline import BillingPipeline
from .windows import tumbling_counts, session_windows, dedup_within_watermark

__all__ = ["BillingPipeline", "tumbling_counts", "session_windows", "dedup_within_watermark"]
