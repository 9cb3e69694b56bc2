"""Structured Streaming variants of the batch event operators (SURVEY §2.8).

Not in the reference (strictly batch); this is the north-star streaming
surface: the same logical windows/dedup/sessionization as the batch
queries, expressed over an unbounded source. Not DuckDB-checkable →
verified by batch/stream agreement tests, never declared in queries().
"""

from .events import (  # noqa: F401
    dedup_within_watermark,
    session_counts,
    sliding_counts,
    stream_events_from_files,
    tumbling_counts,
)
from .scd import scd2_stream  # noqa: F401
from .stateful import running_user_totals  # noqa: F401
