"""Structured Streaming operators over the events stream.

The reference is batch-iterative (SURVEY §2.8) — its only stream-like
construct is the retry-after pass. A production crawl pipeline still
needs true streaming ingest for fetch logs / event feeds, so the engine
ships the standard shape: file source → event-time watermark → tumbling
window aggregation → sink. ``availableNow`` processes the full backlog
with streaming semantics (checkpointed, incremental micro-batches) and
terminates, which makes it oracle-able: the result equals the batch
windowed aggregation over the same data.

Scale notes: the windowed agg is keyed (window, event_type) — state per
key is a counter, partial-aggregated map-side; watermark bounds state
retention (late rows beyond it are dropped, state for closed windows is
evicted). At 10^10 events/day the shape is unchanged — only
``spark.sql.shuffle.partitions`` and the source trigger sizing move.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the events stream through a watermarked tumbling-window
    count and return the completed result as a (batch) DataFrame.

    Uses a parquet *file streaming source* with ``availableNow`` so the
    run is finite and deterministic; the checkpoint lives in a temp dir
    (a real deployment points it at durable storage — same code path).
    """
    schema = spark.read.parquet(events_path).schema
    # the file streaming source monitors a DIRECTORY; point it at the
    # parent with a glob when given a single file
    import os

    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(events_path))
        )
        stream = reader.parquet(os.path.dirname(events_path))
    else:
        stream = spark.readStream.schema(schema).parquet(events_path)
    # watermarks require TIMESTAMP (with tz); the source stores NTZ —
    # session tz is pinned UTC, so the round-trip is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    # stable digest, not process-salted hash() (ADVICE r1)
    import hashlib

    name = f"windowed_events_{hashlib.md5(events_path.encode()).hexdigest()[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
