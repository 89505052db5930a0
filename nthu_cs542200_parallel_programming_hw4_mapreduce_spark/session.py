"""SparkSession factory tuned for the test/bench environment.

The reference hand-rolls everything a session provides — MPI rank setup
(hw4.cc:53-59), thread pools (hw4.cc:210), shuffle files (hw4.cc:444-453).
Here one builder call replaces all of it; the config below is the
scale-posture part (AQE on, shuffle partitions sized to cores, Arrow on).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduce-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    On a real cluster the same settings apply except ``master`` — AQE
    handles runtime re-planning (skew joins, partition coalescing) which
    matters far more at 100 TB than any static choice here.
    """
    # Guide §5 (round 14): every Spark task slot runs its own Python
    # worker, so a multi-threaded BLAS inside the mapInPandas kernels
    # multiplies: N task slots × K BLAS threads oversubscribes the box
    # (this host's OpenBLAS is built MAX_THREADS=2 → up to 2× at 32
    # slots), and the kernels' GEMMs are (batch × 32)-sized, far below
    # where BLAS threading pays. One thread per worker is the standard
    # Spark posture. setdefault: an operator who wants different
    # threading sets the env before launch and wins. Must happen before
    # the JVM starts — Python workers inherit the driver's environment.
    for _blas_var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS"):
        os.environ.setdefault(_blas_var, "1")
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(int(cpus), 32))))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stderr quiet: the driver's bench gate captures only the
        # last ~2 KB of combined output, and console progress redraws
        # are the one remaining writer that could land after the JSON
        # line (bench.py also drops the log level to ERROR)
        .config("spark.ui.showConsoleProgress", "false")
        # Hygiene (VERDICT r11 #7): Spark's default warehouse dir is
        # ./spark-warehouse relative to the launch cwd, so any local
        # run launched from the repo root could litter it. Point it at
        # a per-process temp dir instead — no plan here uses a
        # persistent catalog, so nothing depends on its location.
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), f"spark-warehouse-{os.getpid()}"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
