"""Production streaming sinks: checkpointed parquet and foreachBatch.

``windows.run_to_memory_sink`` is the test/dev harness; these are the
shapes a real pipeline runs. Exactly-once comes from the checkpoint:
the file-source offsets and sink commit log live under
``checkpoint_dir``, so a crashed/restarted query resumes from the last
committed batch instead of re-emitting (asserted by the restart test in
``tests/test_stateful_writers.py``).

foreachBatch is the escape hatch for sinks Spark lacks a connector for
(JDBC upserts, multi-table fan-out): the function receives a *batch*
DataFrame plus the batch id, and must be idempotent on batch id replay —
the standard contract for exactly-once-by-retry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def run_to_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    partition_by: tuple[str, ...] = (),
    timeout_sec: float = 120.0,
) -> StreamingQuery:
    """Drain the available stream data into a parquet directory with a
    checkpoint (exactly-once across restarts). Append-mode only sinks
    finalized results — with a watermarked aggregation, windows still
    open at end-of-stream stay in state until more data (or a later run)
    closes them; that is correct behavior, not data loss."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    q.awaitTermination(timeout_sec)
    return q


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    timeout_sec: float = 120.0,
) -> StreamingQuery:
    """Drive the stream through ``batch_fn(batch_df, batch_id)`` with a
    checkpoint. ``batch_fn`` must be idempotent per batch_id (a replayed
    batch keeps the same id — dedup on it for exactly-once side effects).
    """
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
