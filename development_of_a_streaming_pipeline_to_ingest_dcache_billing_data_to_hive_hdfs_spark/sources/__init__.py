"""Source abstractions: batch table loaders + stream sources."""

from .tables import load_table, load_tables, register_views
from .stream import billing_stream_source

__all__ = ["load_table", "load_tables", "register_views", "billing_stream_source"]
