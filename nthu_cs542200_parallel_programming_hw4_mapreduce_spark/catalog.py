"""Table catalog over the driver's parquet fixtures.

The reference's only "catalog" is a CLI filename argument plus a
hard-coded (string,int) schema (hw4.cc:15, 42-49). Here every fixture
table is a parquet scan — columnar, with predicate pushdown and column
pruning supplied by the data source (SURVEY.md §2.2 "file formats").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor
#: (TPC-H: region is 5 rows, nation 25 — constant in SF).
BROADCAST_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table; Catalyst prunes columns and
    pushes predicates into this scan automatically.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright — read it as raw nanos (legacy flag) and
    convert to a microsecond TimestampType with integer division (a
    double division would lose precision: ns epochs ≈ 1.7e18 exceed a
    double's 2^53 integer range). DuckDB's epoch_us truncates the same
    way, so the engines agree on every microsecond.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
