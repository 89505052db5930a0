"""Evaluation-metric and statistical-insight declared queries.

The metrics a training-data pipeline computes ABOUT its data and the
cheap models guarding it: ranking quality (AUC), probability
calibration, inter-rater agreement (Cohen's kappa), time-to-event
survival (Kaplan-Meier), and first-digit-law data forensics (Benford).
Every query follows the repo's exact-arithmetic discipline — counts
stay integers through the whole plan, float ops are a single identical
closed form in both engines, rounded (the PageRank reassociation rule;
see ``ab_test_ztest``).

The reference (hw4.cc) has no analytics surface at all — these extend
the engine the way SURVEY.md §2.2's "beyond the reference" mandate
describes, alongside the stats family (ab_test_ztest, chi2, KS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import text as X
from ..registry import query
from .text import _DD_NTOKS, _dd_lang_case, lang_pred_frame

# Shared label/score fragments: the "model" under evaluation is the
# cheap is-English detector signal (score = whitespace token count,
# label = stored lang tag) — deliberately simple so the METRIC
# arithmetic is what the oracle verifies, not a model. NULL text
# yields a NULL token count in both engines (token_count_est's proven
# contract); coalesce to 0 so unparseable docs score lowest instead of
# vanishing from the ranking.
_DD_SCORE = f"coalesce({_DD_NTOKS}, 0)"
_DD_LABEL = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"


def _score_label(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.coalesce(X.token_count("text"), F.lit(0)).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )


@query(
    "quality_score_auc",
    oracle=f"""
    WITH base AS (
      SELECT {_DD_SCORE} AS s, {_DD_LABEL} AS y FROM documents
    ), g AS (
      SELECT s, SUM(y) AS p, SUM(1 - y) AS q FROM base GROUP BY s
    ), w AS (
      SELECT p, q,
             coalesce(SUM(q) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
      FROM g
    )
    SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(q) AS BIGINT) AS n_neg,
           round(CAST(SUM(p * (2 * nb + q)) AS BIGINT)
                 / nullif(2.0 * SUM(p) * SUM(q), 0.0), 6) AS auc
    FROM w
    """,
)
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of a score against a binary label via the Mann-Whitney
    rank-sum identity — the one-number readout for every quality/
    toxicity/lang classifier gating a 100 TB corpus (is the score
    actually ordering the data?).

    AUC = P(score_pos > score_neg) + ½·P(tie). Instead of ranking rows
    (a corpus-sized global sort), group by DISTINCT score value —
    per-value positive/negative counts are one partial-agg'd shuffle of
    |score domain| rows — then a cumulative window over that domain
    gives each value the negatives strictly below it:
    2U = Σ_values p·(2·neg_below + q). Everything through 2U is exact
    integer arithmetic (no float ranks, no tie-correction epsilon);
    the single closed-form division happens once, identically spelled
    in both engines, then rounds (exact while n_pos·n_neg < 2^52 —
    ~10^26 docs before the last ulp can wobble).

    Scale shape: the window runs over the score DOMAIN (≤ max tokens
    per doc), not the corpus — single-partition is fine at any corpus
    size because the grouped frame is domain-sized; the corpus is
    touched once by the codegen'd tokenize+count scan. Degenerate
    inputs (one class absent, empty table) yield NULL auc via nullif,
    never a division error."""
    base = _score_label(table(spark, sf_dir, "documents"))
    g = base.groupBy("s").agg(
        F.sum("y").alias("p"), F.sum(F.lit(1) - F.col("y")).alias("q")
    )
    w_below = (
        Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    )
    w = g.select(
        "p", "q", F.coalesce(F.sum("q").over(w_below), F.lit(0)).alias("nb")
    )
    return w.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("p") * (2 * F.col("nb") + F.col("q"))).cast("long")
            / F.nullif(2.0 * F.sum("p") * F.sum("q"), F.lit(0.0)),
            6,
        ).alias("auc"),
    )


@query(
    "score_calibration_bins",
    oracle=f"""
    WITH base AS (
      SELECT least({_DD_SCORE}, 100) AS sc, {_DD_LABEL} AS y FROM documents
    )
    SELECT least(sc * 10 // 100, 9) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(SUM(sc) / (100.0 * COUNT(*)), 6) AS mean_pred,
           round(SUM(y) / (1.0 * COUNT(*)), 6) AS pos_rate
    FROM base GROUP BY 1 ORDER BY bin
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: bucket a [0,1] prediction into 10
    equal-width bins and compare mean predicted probability to the
    observed positive rate per bin — the calibration readout that
    tells you whether a quality score's 0.9 actually means 90%.

    The prediction is the capped token count scaled to [0,1]
    (min(tokens,100)/100) — kept as an INTEGER numerator end-to-end so
    binning is exact integer floor-division (sc·10 // 100; DuckDB `//`
    ≡ Spark `div` on non-negative ints) with no float-boundary row
    flips, and the two per-bin means are exact integer sums with ONE
    closed-form division each at emission.

    Scale shape: one codegen'd scan, one partial-agg'd groupBy of ≤10
    bins — the shuffle carries 10 partials per task regardless of
    corpus size."""
    base = _score_label(table(spark, sf_dir, "documents")).select(
        F.least(F.col("s"), F.lit(100)).alias("sc"), "y"
    )
    return (
        base.groupBy(
            F.least(F.expr("sc * 10 div 100"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("sc") / (100.0 * F.count("*")), 6).alias("mean_pred"),
            F.round(F.sum("y") / (1.0 * F.count("*")), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


@query(
    "label_agreement_kappa",
    oracle=f"""
    WITH pred AS (
      SELECT coalesce(lang, 'und') AS a, {_dd_lang_case()} AS b
      FROM documents
    ), ma AS (
      SELECT a AS k, COUNT(*) AS ca FROM pred GROUP BY a
    ), mb AS (
      SELECT b AS k, COUNT(*) AS cb FROM pred GROUP BY b
    ), pe AS (
      SELECT coalesce(SUM(ca * cb), 0) AS s FROM ma JOIN mb USING (k)
    ), t AS (
      SELECT COUNT(*) AS n,
             coalesce(SUM(CASE WHEN a = b THEN 1 ELSE 0 END), 0) AS agree
      FROM pred
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
           round(agree / nullif(1.0 * n, 0.0), 6) AS po,
           round(s / nullif(1.0 * n * n, 0.0), 6) AS pe,
           round((1.0 * agree * n - s)
                 / nullif(1.0 * n * n - s, 0.0), 6) AS kappa
    FROM t CROSS JOIN pe
    """,
)
def label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two raters of every document's language:
    rater A = the stored ``lang`` tag (NULL → 'und'), rater B = the
    stopword-argmax detector (``lang_id``'s exact fold, shared via
    :func:`plans.text.lang_pred_frame`) — chance-corrected agreement,
    the standard audit for "does the metadata label actually match the
    content?" before trusting either for sampling weights.

    κ = (p_o − p_e)/(1 − p_e) reduces to (agree·n − Σ_k ca_k·cb_k) /
    (n² − Σ_k ca_k·cb_k) — exact integers until ONE closed-form
    division (exact while n < 2^26 per class product; beyond that the
    rounded double is still deterministic because both engines compute
    the identical expression). p_o/p_e are emitted too (rounded) so
    the consumer sees the raw agreement alongside the correction.

    Scale shape: the corpus is touched once by the shared tokenize+
    fold scan; the confusion marginals are two |classes|-sized aggs
    joined on class (|langs|² ≤ 36 rows — broadcast), and the final
    row is a crossJoin of two one-row frames. Empty input degrades to
    the oracle's NULL-metric single row via nullif, not a crash."""
    docs = table(spark, sf_dir, "documents")
    pred = lang_pred_frame(docs, extra_cols=("lang",)).select(
        F.coalesce(F.col("lang"), F.lit("und")).alias("a"),
        F.col("lang_pred").alias("b"),
    )
    ma = pred.groupBy(F.col("a").alias("k")).agg(F.count("*").alias("ca"))
    mb = pred.groupBy(F.col("b").alias("k")).agg(F.count("*").alias("cb"))
    pe = (
        ma.join(mb, "k")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("s"))
    )
    t = pred.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0)), F.lit(0)
        ).alias("agree"),
    )
    j = t.crossJoin(pe)
    n, agree, s = F.col("n"), F.col("agree"), F.col("s")
    return j.select(
        n.cast("long").alias("n"),
        agree.cast("long").alias("agree"),
        F.round(agree / F.nullif(1.0 * n, F.lit(0.0)), 6).alias("po"),
        F.round(s / F.nullif(1.0 * n * n, F.lit(0.0)), 6).alias("pe"),
        F.round(
            (1.0 * agree * n - s) / F.nullif(1.0 * n * n - s, F.lit(0.0)), 6
        ).alias("kappa"),
    )


@query(
    "benford_first_digit",
    oracle="""
    WITH v AS (
      SELECT try_cast(o_totalprice AS DECIMAL(18,2)) AS p FROM orders
      WHERE try_cast(o_totalprice AS DECIMAL(18,2)) > 0
    ), d AS (
      SELECT CAST(regexp_extract(CAST(p AS VARCHAR), '[1-9]') AS INT)
               AS digit
      FROM v
    ), c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY digit
    )
    SELECT digit, cnt,
           round(cnt / (1.0 * SUM(cnt) OVER ()), 6) AS obs_p,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_p
    FROM c ORDER BY digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensics on order totals: the distribution of
    first significant digits vs log10(1+1/d) — the classic screen for
    fabricated or truncated monetary data before it feeds revenue
    aggregates (synthetic uniform prices fail it loudly; that's the
    point of emitting observed next to expected).

    The digit comes from the DECIMAL(18,2) string form, not float
    math: floor(x/10^floor(log10 x)) misclassifies at power-of-ten
    boundaries where log10 lands an ulp low, while decimal→string is
    exact and identically zero-padded in both engines ('1013.70'), so
    the first [1-9] match IS the first significant digit, for values
    below 1 too ('0.50' → 5). Out-of-DECIMAL-domain and non-positive
    values are try_cast/filter-gated, mirrored verbatim (the hostile-
    fixture contract: a poison row must not kill the scan — SCALING.md
    "unrepresentable rows are gated"). Digits absent from the data are
    absent rows, not zero rows (the consumer diffs against the 9-row
    expectation).

    Scale shape: one scan, one ≤9-group partial agg; the window total
    runs over ≤9 grouped rows. Counts exact; the two emitted ratios
    are single closed-form float ops rounded."""
    orders = table(spark, sf_dir, "orders")
    p = F.expr("try_cast(o_totalprice AS DECIMAL(18,2))")
    v = orders.select(p.alias("p")).filter(F.col("p") > 0)
    d = v.select(
        F.regexp_extract(F.col("p").cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").cast("long").alias("cnt"))
    tot = F.sum("cnt").over(Window.partitionBy())
    return c.select(
        "digit",
        "cnt",
        F.round(F.col("cnt") / (1.0 * tot), 6).alias("obs_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_p"),
    ).orderBy("digit")


@query(
    "kaplan_meier_conversion",
    oracle="""
    WITH ue AS (
      SELECT user_id,
             min(CAST(ts AS DATE)) AS t0,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS tp,
             max(CAST(ts AS DATE)) AS tl
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ), u AS (
      SELECT CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
                  ELSE date_diff('day', t0, tl) END AS t,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ue
    ), g AS (
      SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM u GROUP BY t
    ), r AS (
      SELECT t, d,
             SUM(c) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      FROM g
    ), k AS (
      SELECT t, d, n_risk,
             CASE WHEN d = n_risk THEN NULL
                  ELSE CAST(round(ln(1.0 - d / (1.0 * n_risk)), 12)
                            AS DECIMAL(18,12)) END AS lf,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
      FROM r WHERE d > 0
    ), s AS (
      SELECT t, d, n_risk,
             SUM(lf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cl,
             SUM(z)  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zz
      FROM k
    )
    SELECT CAST(t AS BIGINT) AS t_day, CAST(d AS BIGINT) AS d_events,
           CAST(n_risk AS BIGINT) AS n_risk,
           CASE WHEN zz > 0 THEN 0.0
                ELSE round(exp(CAST(cl AS DOUBLE)), 6) END AS survival
    FROM s ORDER BY t_day
    """,
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: the survival curve of "still
    hasn't purchased" by days since a user's first event, with users
    who never purchase right-censored at their last observed day —
    the estimator product teams use when conversion times are
    incomplete by construction (cohort analysis with open windows).

    S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over distinct event days. The
    risk sets are exact-integer reverse-cumulative counts over the
    grouped day axis. The float product is the one genuinely
    transcendental step, handled by the repo's reassociation rule
    taken one step further: each per-step ln(1 − d/n) — a single
    identical double op — is ROUNDED to 12 dp and cast to
    DECIMAL(18,12) BEFORE the cumulative sum, so the running sum is
    exact decimal arithmetic (association-free; Spark's sequential
    running frame vs DuckDB's segment-tree window would otherwise
    disagree in the last ulp), and exp() fires once per row on
    identical inputs. A step that empties the risk set (d = n) has
    ln(0) = −∞ — Spark yields NULL where DuckDB yields -inf — so it is
    gated to an explicit cumulative zero-flag and survival pins to 0.0
    from that step on, in both engines.

    NULL-ts events are excluded per the repo's timeline contract
    (unplaceable events can't anchor a duration — SCALING.md). Scale
    shape: one users-sized partial-agg'd groupBy, then every window
    runs over the distinct-DURATION axis (≤ observation span in days,
    corpus-size-independent), single-partition by design."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d_ = F.col("ts").cast("date")
    ue = ev.groupBy("user_id").agg(
        F.min(d_).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", d_)).alias("tp"),
        F.max(d_).alias("tl"),
    )
    u = ue.select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("tl"), F.col("t0")))
        .alias("t"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    g = u.groupBy("t").agg(F.sum("ev").alias("d"), F.count("*").alias("c"))
    w_rev = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    r = g.select("t", "d", F.sum("c").over(w_rev).alias("n_risk")).filter(
        F.col("d") > 0
    )
    dead = F.col("d") == F.col("n_risk")
    k = r.select(
        "t",
        "d",
        "n_risk",
        F.when(dead, F.lit(None))
        .otherwise(
            F.round(
                F.log(1.0 - F.col("d") / (1.0 * F.col("n_risk"))), 12
            ).cast("decimal(18,12)")
        )
        .alias("lf"),
        F.when(dead, 1).otherwise(0).alias("z"),
    )
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    s = k.select(
        "t",
        "d",
        "n_risk",
        F.sum("lf").over(w_run).alias("cl"),
        F.sum("z").over(w_run).alias("zz"),
    )
    return s.select(
        F.col("t").cast("long").alias("t_day"),
        F.col("d").cast("long").alias("d_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.when(F.col("zz") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cl").cast("double")), 6))
        .alias("survival"),
    ).orderBy("t_day")
