"""Replicates the driver's t2 correctness gate locally at sf0.001:
every oracle-declared query must match DuckDB exactly (row count,
columns, values)."""

import duckdb
import pytest

import __spark_entry__ as E
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import TABLES
from tools.parity import compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = E.queries()[name](spark, sf_dir).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(E.queries()) - set(E.oracle_sql())))
def test_rows_only_queries_run(spark, sf_dir, name):
    assert E.queries()[name](spark, sf_dir).count() >= 0
