"""Event-time analytics over ``events`` — batch windowed aggregation
(the SQL-checkable proxy, SURVEY.md §2.2 "streaming") plus a real
Structured Streaming variant in :mod:`..streaming.windows`.

All double aggregations go through DECIMAL so engine and oracle agree
bit-for-bit regardless of accumulation order — mandatory at 1000
executors where accumulation order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "event_window",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS av
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (batch form): hourly counts +
    mean value per event type. One shuffle on (event_type, hour)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("cnt"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("av"),
        )
        .orderBy("event_type", "h")
    )


@query(
    "event_session",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def event_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + gap counting —
    the batch form of session_window. One shuffle on user_id; gaps are
    compared in integral microseconds so both engines agree exactly."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    g = ev.select(
        "user_id",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured props column — scan-side
    expression, no shuffle."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    ).orderBy("event_id")


@query(
    "streaming_window",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: readStream over the events parquet,
    1-hour tumbling window aggregation, complete-mode memory sink, driven
    to completion synchronously. The returned DataFrame is the final
    result table — and it matches the batch oracle exactly, demonstrating
    the batch/streaming unification Spark gives (the reference is
    batch-only, SURVEY.md §2.2)."""
    from ..streaming.windows import run_windowed_count

    return run_windowed_count(spark, f"{sf_dir}/events.parquet")
