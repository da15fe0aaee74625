"""Windowed event aggregation — batch/stream dual operators.

Design: every aggregation here is written against a plain DataFrame, so the
SAME function runs in batch mode (oracle-checkable by the driver) and on a
``readStream`` source (true streaming). That keeps streaming correctness
testable: batch output == streaming output after the final watermark, which
tests assert via the file-source + memory-sink harness in
``tests/test_streaming.py``.

Scale notes: windowed aggs shuffle on (window, keys); state size is bounded
by the watermark horizon; ``dropDuplicatesWithinWatermark`` keeps the dedup
state bounded too (its batch twin is plain dropDuplicates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based event stream (the parquet-dir analogue of a Kafka topic).

    Schema must be explicit — streaming sources never infer at scale."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    keys: Sequence[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count+sum per key. Batch and streaming alike."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    keys: Sequence[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation: each event lands in width/slide windows."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key (F.session_window; state merges automatically)."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n",
            "sum_value",
        )
    )


def dedup_events(
    events: DataFrame,
    subset: Sequence[str],
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Duplicate-event suppression. In streaming mode, state is bounded by
    the watermark (dropDuplicatesWithinWatermark); batch twin is plain
    dropDuplicates over the same subset."""
    if watermark is not None and events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(subset)
        )
    return events.dropDuplicates(list(subset))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Event interval join (stream-stream capable): every left event pairs
    with the right events of the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + within]``.

    Batch/stream dual like the window aggs: in streaming mode pass
    ``watermark`` — both sides get watermarked and the time-range predicate
    bounds the join state Spark must retain (state eviction follows the
    watermark + interval, the standard stream-stream inner-join contract).
    In batch mode the same plan is a single equi-join on ``key`` with the
    range predicate applied post-match (AQE handles skewed keys).

    Output delay is integer microseconds (``unix_micros`` diff) so batch,
    streaming and SQL oracles agree bit-for-bit.
    """
    l = left.select(
        F.col(key).alias(key),
        F.col(ts_col).alias("l_ts"),
        F.col(id_col).alias("l_id"),
    )
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(ts_col).alias("r_ts"),
        F.col(id_col).alias("r_id"),
    )
    if watermark is not None:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .select(
            key,
            "l_id",
            "r_id",
            (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("delay_us"),
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: float = 120.0,
) -> StreamingQuery:
    """Drive a streaming plan into an in-memory table until the source is
    exhausted (test/dev harness; production uses foreachBatch/parquet sinks)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
