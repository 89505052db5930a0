"""Event-time windowed aggregation as a real Structured Streaming job.

Batch parquet drives the stream (file source); ``processAllAvailable``
runs it to completion synchronously, which is the standard local test
harness for streaming topologies. On a cluster the same topology points
at Kafka and runs forever; watermarking (see ``run_windowed_count``'s
``watermark`` arg) bounds state for append-mode sinks.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_sink_counter = itertools.count()
_stage_dirs: dict[str, str] = {}


def events_stream(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """readStream over the events parquet (schema must be explicit for
    file-source streams). The fixture's ts is TIMESTAMP(NANOS) → read as
    raw nanos and convert with integer division (see catalog.table).

    Spark's file stream source requires a *directory*; a single-file
    path is staged as a symlink inside a scratch directory (read-only
    fixtures stay untouched). ``options`` pass through to the source
    reader (e.g. ``maxFilesPerTrigger`` to bound per-micro-batch state —
    the production knob the 100× scale probe exercises).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # one staging dir per source file, reused across calls (repeated
        # streaming queries in a session must not accumulate /tmp dirs)
        if path not in _stage_dirs:
            stage = tempfile.mkdtemp(prefix="stream_src_")
            os.symlink(path, os.path.join(stage, os.path.basename(path)))
            _stage_dirs[path] = stage
        stream_path = _stage_dirs[path]
    else:
        stream_path = path
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    src = reader.parquet(stream_path)
    if dict(src.dtypes).get("ts") == "bigint":
        src = src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(src.dtypes).get("ts") == "timestamp_ntz":
        # Parquet timestamp-without-timezone reads as TIMESTAMP_NTZ, which
        # watermarks/event-time reject; session TZ is UTC so the cast is exact.
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def windowed_count_stream(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """The streaming window-count topology itself (unstarted): readStream
    → optional watermark → tumbling/hopping window agg. Split out of
    ``run_windowed_count`` so tests can drive the SAME topology through
    multi-micro-batch feeds (late-data/watermark proofs) instead of the
    one-shot processAllAvailable wrapper."""
    src = events_stream(spark, path)
    if watermark:
        src = src.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double").alias("sv"),
        )
        .select("event_type", F.col("w.start").alias("h"), "cnt", "sv")
    )


def run_windowed_count(
    spark: SparkSession,
    path: str,
    window: str = "1 hour",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, hopping) window count + DECIMAL sum
    per event type.

    complete-mode memory sink → every window is in the result table, so
    the output equals the batch groupBy — the unification property the
    declared-query oracle checks. With ``watermark`` set and append mode
    this becomes the production late-data topology; complete+no-watermark
    is right for a finite backfill like this. ``slide`` reuses the same
    topology for overlapping windows (each event lands in window/slide
    state rows — state volume scales with that ratio, which is why
    production hops are small multiples, not sliding-by-record).
    """
    agg = windowed_count_stream(spark, path, window, watermark, slide)
    name = f"stream_windowed_{next(_sink_counter)}"
    mode = "append" if watermark else "complete"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("event_type", "h")
