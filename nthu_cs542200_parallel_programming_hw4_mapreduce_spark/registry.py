"""Declared-query registry — the bridge to the driver contract.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus, when SQL-expressible, a
DuckDB oracle string. ``__spark_entry__.queries()/oracle_sql()`` simply
re-export these dicts.

Column-name discipline: the driver hashes values after sorting columns
by name, so every computed column is aliased identically in the Spark
plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → rows-only check
    (genuinely non-SQL-expressible ops only — the driver records which)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import every plan module so its @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from .plans import core, text, dedup, similarity, multimodal, streaming  # noqa: F401

    _LOADED = True
