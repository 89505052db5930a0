"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship wordcount_e2e (the reference's entire
query surface, SURVEY.md §2.1) at sf0.001; ``queries()``/``oracle_sql()``
re-export the engine's declared-query registry
(nthu_cs542200_parallel_programming_hw4_mapreduce_spark.registry), where
every operator from SURVEY.md §2 registers itself with a DuckDB oracle
unless genuinely non-SQL-expressible (LSH ANN probes, mapInPandas
feature extraction) — those are rows-only by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.core import (
    wordcount_e2e,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return wordcount_e2e(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible declared query."""
    return registry.all_oracles()
