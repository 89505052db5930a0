"""Round-13 drain-harness internals: the state-partition /
no-data-micro-batch knobs must be scoped (session conf restored) and
must never change what a drained topology RETURNS — only what it costs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.streaming.windows import (
    events_stream,
    harness_state_partitions,
    run_drained,
    stream_start_conf,
)


def test_stream_start_conf_scopes_and_restores(spark):
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    with stream_start_conf(spark, state_partitions=2, no_data_batches=False):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        == before_nodata
    )


def test_stream_start_conf_restores_on_error(spark):
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with stream_start_conf(spark, state_partitions=3):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts


def test_default_state_partitions_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "12")
    assert harness_state_partitions() == 12
    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    assert harness_state_partitions() == 4


def test_no_data_batch_skip_is_result_invariant_for_complete_agg(
    spark, sf_dir
):
    """A complete-mode watermarked aggregate emits its final table with
    the last data batch; the trailing no-data batch only evicts state.
    Drain the same topology both ways and require identical rows."""

    def topo():
        src = events_stream(spark, f"{sf_dir}/events.parquet").withWatermark(
            "ts", "1 hour"
        )
        return src.groupBy("event_type").agg(F.count("*").alias("cnt"))

    with_nd = {
        (r["event_type"], r["cnt"])
        for r in run_drained(
            spark, topo(), "complete", "nd_on", no_data_batches=True
        ).collect()
    }
    without_nd = {
        (r["event_type"], r["cnt"])
        for r in run_drained(
            spark, topo(), "complete", "nd_off", no_data_batches=False
        ).collect()
    }
    assert with_nd == without_nd
    assert without_nd  # non-vacuous


def test_no_data_batch_skip_is_result_invariant_for_inner_join(spark, sf_dir):
    """ADVICE r13: the riskier append-mode INNER stream-stream join skip
    rested on comment-level reasoning. Drain the identical topology both
    ways (no-data batch on/off) and require identical row sets — inner
    matches emit as soon as both sides arrive, so the trailing
    watermark-advancing batch must only evict state, never emit."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.streaming.joins import (
        clicks_purchases_join_stream,
    )

    def drain(nd: bool, name: str):
        topo = clicks_purchases_join_stream(spark, f"{sf_dir}/events.parquet")
        return {
            tuple(r)
            for r in run_drained(
                spark, topo, "append", name,
                state_partitions=4, no_data_batches=nd,
            ).collect()
        }

    with_nd = drain(True, "nd_join_on")
    without_nd = drain(False, "nd_join_off")
    assert with_nd == without_nd
    assert without_nd  # non-vacuous


def test_no_data_batch_skip_is_result_invariant_for_watermarked_dedup(
    spark, sf_dir
):
    """ADVICE r13: same both-ways proof for the watermarked-dedup
    complete-mode count — dropDuplicatesWithinWatermark emits each
    surviving key in the batch where it is FIRST seen, so the final
    complete-mode table is already emitted with the last data batch;
    the trailing no-data batch may only evict expired keys."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.streaming.windows import (
        events_stream,
    )

    def topo():
        src = events_stream(spark, f"{sf_dir}/events.parquet").select(
            "event_id", "ts"
        )
        doubled = src.unionByName(
            events_stream(spark, f"{sf_dir}/events.parquet").select(
                "event_id", "ts"
            )
        )
        return (
            doubled.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
            .agg(F.count("*").alias("n_unique"))
        )

    with_nd = {
        r["n_unique"]
        for r in run_drained(
            spark, topo(), "complete", "nd_dwm_on", no_data_batches=True
        ).collect()
    }
    without_nd = {
        r["n_unique"]
        for r in run_drained(
            spark, topo(), "complete", "nd_dwm_off", no_data_batches=False
        ).collect()
    }
    assert with_nd == without_nd
    assert without_nd  # non-vacuous
