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


_UNICODE_TEXTS = [
    "héllo wörld héllo",            # latin diacritics
    "a b c b c",                         # non-breaking space
    "x​y z​y z",                         # zero-width space
    "éclair éclair éclair",        # precomposed vs combining
    "a　b a　b",                           # ideographic space
    "tab\ttab\ttab mix \t mix",
    " line sep para sep x",              # line/para separators
    "日本語 テスト",       # CJK
    "مرحبا بالعالم",  # RTL
    "\U0001f600 surrogate pair \U0001f600 again",  # astral-plane emoji
]

_UNICODE_SENSITIVE = [
    "wordcount_e2e", "ngram_freq", "heavy_hitters", "tfidf_top_terms",
    "vocab_growth_curve", "text_quality", "text_normalize", "lang_id",
    "dedup_exact", "dedup_ngram_jaccard", "quality_gopher",
    "readability_flesch", "perplexity_unigram", "substring_dup_rate",
    "shingle_fingerprints", "text_repetition", "url_canonicalize",
    "tfidf_cosine_pairs", "paragraph_dedup", "pmi_collocations",
]


def test_text_oracles_hold_on_unicode(spark, tmp_path_factory):
    """Spark tokenization runs on Java regex, the oracle on DuckDB's
    RE2 — their \\s classes and string functions must agree on the
    Unicode the ASCII-ish fixtures never exercise: NBSP / zero-width /
    ideographic spaces, combining marks, CJK, RTL, astral-plane emoji,
    line separators. Both engines treat \\s as ASCII-only (probed in
    round 4), so e.g. NBSP-joined words stay ONE token in both — this
    test pins that agreement per text-sensitive query."""
    import duckdb

    from tools.parity import compare

    d = str(tmp_path_factory.mktemp("unicode"))
    rows = [(i, t, "xx", f"s{i % 2}", len(t)) for i, t in enumerate(_UNICODE_TEXTS)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    problems = []
    for name in _UNICODE_SENSITIVE:
        sdf = E.queries()[name](spark, d).toPandas()
        ddf = con.execute(E.oracle_sql()[name]).df()
        problems += [f"{name}: {p}" for p in compare(name, sdf, ddf)]
    assert not problems, "\n".join(problems)


_TS_EDGES = [
    # pre-epoch (negative micros), epoch boundary, leap day, year
    # boundary, far future (within Arrow ns range), and 1900
    (1969, 12, 31, 23, 59, 59),
    (1969, 7, 20, 20, 17, 40),
    (1970, 1, 1, 0, 0, 0),
    (2000, 2, 29, 12, 0, 0),
    (2024, 12, 31, 23, 59, 59),
    (2025, 1, 1, 0, 0, 0),
    (2200, 6, 15, 12, 0, 0),
    (1900, 1, 1, 0, 0, 0),
]

_TS_SENSITIVE = [
    "event_window", "scd2_history", "retention_cohorts",
    "funnel_weekly_trend", "sliding_distinct_users", "session_paths_topk",
    # salted variant: `unix_micros div day` truncates toward zero, so the
    # epoch-adjacent bucket is 2 days wide — still a contiguous monotone
    # interval ≥ the 30-min gap, which is all the split relies on; this
    # probe pins that on pre-epoch/1900/far-future stamps
    "session_paths_topk_salted",
    "time_weighted_avg", "time_weighted_avg_salted", "bounce_rate_daily",
    "bounce_rate_daily_salted", "markov_transitions",
    "attribution_last_touch", "decayed_engagement",
    "latency_percentile_bands", "burst_detection",
]


def test_temporal_oracles_hold_on_edge_timestamps(spark, tmp_path_factory):
    """date_trunc / window / epoch arithmetic must agree across engines
    on the timestamps the 2024-only fixture never exercises: pre-epoch
    (negative microseconds — a floor-vs-truncate division bug would
    show exactly here), the epoch boundary, a leap day, year
    boundaries, 1900, and a far-future date. Probed green in round 4;
    this pins it for 13 temporal queries."""
    import datetime as dt

    import duckdb

    from tools.parity import compare

    d = str(tmp_path_factory.mktemp("ts_edges"))
    stamps = [dt.datetime(*t) for t in _TS_EDGES]
    rows = [
        (
            i,
            ts + dt.timedelta(minutes=i),
            i % 4,
            ["view", "click", "purchase"][i % 3],
            float(i % 7),
            "{}",
        )
        for i, ts in enumerate(stamps * 4)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    problems = []
    for name in _TS_SENSITIVE:
        sdf = E.queries()[name](spark, d).toPandas()
        ddf = con.execute(E.oracle_sql()[name]).df()
        problems += [f"{name}: {p}" for p in compare(name, sdf, ddf)]
    assert not problems, "\n".join(problems)
