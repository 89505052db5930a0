"""Hand-computed semantics checks for plans/evalmetrics.py.

The parametrized oracle-parity suite proves engine == DuckDB; these
prove both equal the textbook definitions on fixtures small enough to
compute by hand (the repo's family-test pattern, tests/test_graph.py).
"""

import datetime

import pytest

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.evalmetrics import (
    benford_first_digit,
    kaplan_meier_conversion,
    label_agreement_kappa,
    quality_score_auc,
    score_calibration_bins,
)


def _docs_dir(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path_factory.mktemp("evaldocs"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def auc_dir(spark, tmp_path_factory):
    # scores (token counts): positives at 3,3,2 — negatives at 1,3.
    # Pairs (pos, neg): (3,1)✓ (3,3)½ (3,1)✓ (3,3)½ (2,1)✓ (2,3)✗
    # U = 3 + 2·0.5 = 4; AUC = 4 / (3·2) = 0.666667.
    rows = [
        (1, "a b c", "en", "s", 5),
        (2, "a b c", "en", "s", 5),
        (3, "a b", "en", "s", 3),
        (4, "a", "fr", "s", 1),
        (5, "a b c", "fr", "s", 5),
    ]
    return _docs_dir(spark, tmp_path_factory, rows)


def test_auc_matches_hand_computed_rank_sum(spark, auc_dir):
    row = quality_score_auc(spark, auc_dir).first()
    assert (row["n_pos"], row["n_neg"]) == (3, 2)
    assert row["auc"] == pytest.approx(0.666667)


def test_auc_degenerate_single_class_is_null(spark, tmp_path_factory):
    d = _docs_dir(
        spark, tmp_path_factory, [(1, "a b", "en", "s", 3), (2, "a", "en", "s", 1)]
    )
    row = quality_score_auc(spark, d).first()
    assert row["n_neg"] == 0 and row["auc"] is None


def test_calibration_bins_exact_fractions(spark, tmp_path_factory):
    # 20 tokens → bin 2 with mean_pred 0.2; 95 tokens → bin 9.
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [
            (1, " ".join(["w"] * 20), "en", "s", 1),
            (2, " ".join(["w"] * 20), "fr", "s", 1),
            (3, " ".join(["w"] * 95), "en", "s", 1),
        ],
    )
    out = {r["bin"]: r for r in score_calibration_bins(spark, d).collect()}
    assert set(out) == {2, 9}
    assert out[2]["n"] == 2
    assert out[2]["mean_pred"] == pytest.approx(0.2)
    assert out[2]["pos_rate"] == pytest.approx(0.5)
    assert out[9]["mean_pred"] == pytest.approx(0.95)
    assert out[9]["pos_rate"] == pytest.approx(1.0)


def test_kappa_perfect_and_chance_bounds(spark, tmp_path_factory):
    # All-English text tagged 'en' → rater B ('the and is' hits en
    # stopwords) agrees everywhere → kappa is NULL when pe == 1 (single
    # class on both sides: n² == Σ ca·cb), po == 1.
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [(i, "the and is of to", "en", "s", 17) for i in range(4)],
    )
    row = label_agreement_kappa(spark, d).first()
    assert row["n"] == 4 and row["agree"] == 4
    assert row["po"] == pytest.approx(1.0)
    assert row["pe"] == pytest.approx(1.0)
    assert row["kappa"] is None  # 0/0 chance correction — undefined


def test_kappa_known_confusion(spark, tmp_path_factory):
    # 2 docs: one en-tagged en-detected agree, one fr-tagged but
    # English-stopword text (detected en) disagree.
    # n=2, agree=1, po=.5; marginals A: en1 fr1, B: en2 →
    # pe = (1·2)/(2·2) = .5 → kappa = (1·2 − 2)/(4 − 2) = 0.
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [
            (1, "the and is", "en", "s", 11),
            (2, "the and is", "fr", "s", 11),
        ],
    )
    row = label_agreement_kappa(spark, d).first()
    assert row["n"] == 2 and row["agree"] == 1
    assert row["po"] == pytest.approx(0.5)
    assert row["pe"] == pytest.approx(0.5)
    assert row["kappa"] == pytest.approx(0.0)


def test_benford_digit_extraction_and_law(spark, tmp_path_factory):
    rows = [
        (1, 1, "O", 1013.70, datetime.datetime(2026, 1, 1), "1-URGENT"),
        (2, 1, "O", 0.50, datetime.datetime(2026, 1, 1), "1-URGENT"),
        (3, 1, "O", 950.00, datetime.datetime(2026, 1, 1), "1-URGENT"),
        (4, 1, "O", -5.0, datetime.datetime(2026, 1, 1), "1-URGENT"),  # gated
        (5, 1, "O", None, datetime.datetime(2026, 1, 1), "1-URGENT"),  # gated
    ]
    df = spark.createDataFrame(
        rows,
        [
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    d = str(tmp_path_factory.mktemp("benford"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {r["digit"]: r for r in benford_first_digit(spark, d).collect()}
    # 1013.70 → 1; 0.50 → 5 (first SIGNIFICANT digit); 950.00 → 9
    assert set(out) == {1, 5, 9}
    assert all(r["cnt"] == 1 for r in out.values())
    assert out[1]["obs_p"] == pytest.approx(0.333333)
    assert out[1]["benford_p"] == pytest.approx(0.30103, abs=1e-5)
    assert out[9]["benford_p"] == pytest.approx(0.045757, abs=1e-5)


@pytest.fixture(scope="module")
def km_dir(spark, tmp_path_factory):
    """4 users: A purchases day 1, B purchases day 2, C never (censored
    day 2), D purchases day 1. KM: t=1: n=4,d=2 → S=0.5;
    t=2: n=2,d=1 → S=0.25 (C censored AT 2 stays in the risk set)."""
    t0 = datetime.datetime(2026, 3, 1)

    def ev(eid, day, uid, typ):
        return (eid, t0 + datetime.timedelta(days=day), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 0, 1, "view"), ev(2, 1, 1, "purchase"),
        ev(3, 0, 2, "view"), ev(4, 2, 2, "purchase"),
        ev(5, 0, 3, "view"), ev(6, 2, 3, "click"),
        ev(7, 0, 4, "view"), ev(8, 1, 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path_factory.mktemp("km"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_kaplan_meier_hand_computed_curve(spark, km_dir):
    out = {r["t_day"]: r for r in kaplan_meier_conversion(spark, km_dir).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_risk"], out[1]["d_events"]) == (4, 2)
    assert out[1]["survival"] == pytest.approx(0.5)
    assert (out[2]["n_risk"], out[2]["d_events"]) == (2, 1)
    assert out[2]["survival"] == pytest.approx(0.25)


def test_kaplan_meier_risk_set_exhausted_pins_zero(spark, tmp_path_factory):
    """Everyone converts at the same step → factor 0 → survival 0.0
    (the ln(0) NULL-vs-inf engine divergence the zero-flag gates)."""
    t0 = datetime.datetime(2026, 3, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + datetime.timedelta(days=1), 1, "purchase", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + datetime.timedelta(days=1), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path_factory.mktemp("km0"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = kaplan_meier_conversion(spark, d).collect()
    assert len(out) == 1
    assert out[0]["t_day"] == 1 and out[0]["survival"] == 0.0


def test_weighted_sample_keys_match_python_aes(spark, tmp_path_factory):
    """A-ES keys replay exactly from hashlib + math.log, and
    non-positive weights are excluded by contract."""
    import hashlib
    import math

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.text import (
        weighted_sample_topk,
    )

    rows = [(1, "a", "en", "s", 100), (2, "b", "en", "s", 7),
            (3, "c", "en", "s", 0), (4, "d", "en", "s", 55)]
    d = _docs_dir(spark, tmp_path_factory, rows)
    out = {r["doc_id"]: r for r in weighted_sample_topk(spark, d).collect()}
    assert set(out) == {1, 2, 4}  # zero-weight doc 3 excluded
    for doc_id, w in [(1, 100), (2, 7), (4, 55)]:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        key = math.log((h + 0.5) / 2**32) / w
        assert out[doc_id]["sample_key"] == round(key, 6)
        assert out[doc_id]["weight"] == w


def test_json_schema_profile_type_histogram(spark, tmp_path_factory):
    """Planted type diversity: every canonical jtype lands in the right
    bucket, malformed JSON and path-hostile keys are excluded."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        json_schema_profile,
    )

    t0 = datetime.datetime(2026, 5, 1)
    rows = [
        (1, t0, 1, "view", 1.0, '{"k": 1, "tag": "x"}'),
        (2, t0, 1, "view", 1.0, '{"k": "s", "arr": [1]}'),
        (3, t0, 1, "view", 1.0, '{"k": true, "o": {"z": 1}}'),
        (4, t0, 1, "view", 1.0, '{"k": null, "a.b": 7}'),  # dotted key gated
        (5, t0, 1, "view", 1.0, "not json"),               # malformed gated
        (6, t0, 1, "view", 1.0, '{"k": 2.5}'),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path_factory.mktemp("jsp"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {(r["key"], r["jtype"]): r["n"]
           for r in json_schema_profile(spark, d).collect()}
    assert out == {
        ("k", "number"): 2, ("k", "string"): 1, ("k", "bool"): 1,
        ("k", "null"): 1, ("tag", "string"): 1, ("arr", "array"): 1,
        ("o", "object"): 1,
    }


def test_rfm_buckets_hand_computed(spark, tmp_path_factory):
    """5 customers with strictly increasing R/F/M → every quintile
    bucket 1..5 appears exactly once per dimension, and ties share."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.streaming import (
        rfm_segmentation,
    )

    t0 = datetime.datetime(2026, 6, 30)
    rows = []
    oid = 0
    # customer c places c orders, last one (30 - 5c) days before t0,
    # each worth 1000·c → R strictly decreasing recency, F/M increasing
    for c in range(1, 6):
        for i in range(c):
            oid += 1
            rows.append(
                (oid, c, "O", 1000.0 * c,
                 t0 - datetime.timedelta(days=(30 - 5 * c) + i), "1-URGENT")
            )
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    d = str(tmp_path_factory.mktemp("rfm"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = rfm_segmentation(spark, d).collect()
    # five distinct customers, five distinct (r, f, m) profiles →
    # five cells, one customer each, with aligned quintiles
    assert len(out) == 5
    assert all(r["n_customers"] == 1 for r in out)
    rqs = sorted(r["r_q"] for r in out)
    fqs = sorted(r["f_q"] for r in out)
    assert rqs == [1, 2, 3, 4, 5] and fqs == [1, 2, 3, 4, 5]
    # most recent + most frequent customer (c=5) is the champion cell
    champ = [r for r in out if r["f_q"] == 5][0]
    assert champ["r_q"] == 1 and champ["revenue"] == 25000.0
