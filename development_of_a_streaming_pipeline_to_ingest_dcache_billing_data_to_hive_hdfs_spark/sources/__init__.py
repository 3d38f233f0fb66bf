"""Source abstractions: batch table loaders, format connectors, stream
sources."""

from .tables import load_table, load_tables, register_views
from .stream import billing_stream_source
from .formats import BATCH_FORMATS, read_batch, write_batch

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "billing_stream_source",
    "BATCH_FORMATS",
    "read_batch",
    "write_batch",
]
