"""Structured Streaming over the olive format.

The reference format is batch-only (SURVEY.md §2.6) — streaming is this
engine's extension: the chunk-file directory doubles as an append-only
log. ``spark.readStream.format("olive")`` tails it (one microbatch
partition per new file), ``writeStream.format("olive")`` appends chunk
files per microbatch.
"""

from olive_spark.streaming.ops import (  # noqa: F401
    drain_available_now,
    foreach_batch_upsert,
    read_stream,
    run_available_now,
    session_windows,
    sliding_counts,
    stateful_user_totals,
    stream_dedup,
    stream_matview_available_now,
    stream_static_join,
    stream_stream_join,
    stream_to_branch_available_now,
    stream_upsert_available_now,
    tumbling_counts,
    write_stream_olive,
)
