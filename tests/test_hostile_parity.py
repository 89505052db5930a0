"""Hostile-fixture PARITY regression (round 9).

``test_all_queries_survive_degenerate_tables`` proves every query RUNS
on degenerate data; this suite proves the oracle contract HOLDS on
hostile-but-contract-respecting data (PKs intact, everything else
adversarial — see tools/hostile_fixture.py). The round-9 sweep of all
215 oracle-backed queries over this fixture surfaced six real
divergence classes, each now fixed and pinned here:

1. DECIMAL(18,6) per-value casts crashed the whole job under ANSI on a
   1e12 metric value -> every value cast is now try_cast (NULL on
   overflow, identical in Spark and DuckDB).
2. Java's \\s includes \\x0B, RE2's does not -> every JVM tokenizer
   spells the whitespace class explicitly (functions/text.WS).
3. incremental_minhash_dedup sliced micro-batches by dense doc_id
   ranges -> sparse/high ids silently skipped the stream entirely; now
   modulo-sliced.
4. Strict-JSON oracles raised where the engine answers NULL on
   malformed payloads (scalar_json, variant_shred) -> json_valid
   guards + try_parse_json.
5. Event-time window/session assigners DROP NULL-ts rows while plain
   GROUP BY oracles emitted a phantom NULL group -> ts IS NOT NULL
   contract, mirrored both sides. A second hostile wave (a NULL-ts
   event on a REAL user, which sits at the timeline HEAD under Spark's
   NULLS FIRST but the TAIL under DuckDB's NULLS LAST) extended the
   same timeline contract to every per-user ordered sequence: the
   event_session pair, the bounce_rate pair, the session_paths pair,
   markov_transitions, and scd2_history.
6. Assorted NULL-path engine/oracle gaps: empty-array element_at under
   ANSI (embedding_covariance), DuckDB array_to_string([]) = NULL vs
   Spark '' (dedup_cross_snapshot), unpinned NULL rank order
   (quantile_normalize), phantom NULL cohort under an inner join
   (streaming_static_join), failed-encode rows reaching hygiene stats
   (embedding_stats), XML-1.0-unrepresentable control chars killing
   the XML writer (xml_ingest).
7. The multimodal family's "diverges loudly on a non-ASCII doc" claim
   was FALSE for a short doc whose sampled frames were all-ASCII
   (multimodal_framesample passed silently on the café doc) -> the
   ASCII byte==char domain is now an ENFORCED gate mirrored in the
   byte-grid oracles (plans/multimodal._ascii_payloads). Round 10
   narrowed the gate's SCOPE: meta/dedup (byte length, magic, md5)
   are exact for any UTF-8 payload and no longer gate (ADVICE r9).

Round 10 extended the fixture (VERDICT r9 #8) with BOM-prefixed text
(U+FEFF fuses onto the first token in both tokenizers) and 4-byte
supplementary-plane emoji (JVM surrogate pairs: length/substr must
count code points to match DuckDB); lone surrogates are documented
unrepresentable (invalid UTF-8 — parquet and DuckDB both reject).
The Delta-log duplicate-add collision class lives in
tests/test_delta.py::test_duplicate_add_counts_file_once (the Delta
log is not one of the ten fixture tables). The round-10 sweep caught
one more timeline divergence: pit_state_at_event's engine lag window
skipped the oracle's ts IS NOT NULL filter, so the NULL-ts head row
minted a phantom opening state version under Spark's NULLS FIRST —
fixed with the explicit contract (changes from timestamped events
only; a timestampless event's PIT state is NULL on both sides).

Round 10's second fixture wave added TYPE-DIVERSE JSON props (every
canonical jtype for key k, a path-hostile dotted key, a top-level
JSON scalar) and its whole-registry sweep surfaced three more real
divergence classes, each fixed and pinned here:

8. Strict casts of extracted JSON values crashed under ANSI on a
   non-numeric k ({"k": "s"}) — scalar_json now try_casts on both
   sides, and json_quarantine/variant_shred gate on
   json_type IN (UBIGINT, BIGINT) because Spark's from_json /
   typed-variant reads are STRICTLY typed (true, 1.5, even "7" all
   yield NULL) while DuckDB's TRY_CAST of the ->> text would coerce
   them — and bare try_variant_get(..., 'bigint') on the engine side
   coerced too (true → 1, 1.5 → 1), so the shred is now type-gated.
9. Builtin float machinery diverges in the last ulp at 1e11+
   magnitudes, which a 1e12 poison value amplifies past display
   rounding: Spark percentile vs DuckDB quantile_cont interpolate
   differently, DuckDB's round(·, 4) and double→DECIMAL cast both
   drift where Spark's BigDecimal forms are exact, and DuckDB parses
   0.99 as exact DECIMAL where Spark reads a double.
   latency_percentile_bands now spells the interpolation AND the 4-dp
   quantizer as shared arithmetic (sorted in-domain array,
   lo + (hi−lo)·f, floor(x·1e4 + 0.5)/1e4, literals pinned ::DOUBLE)
   and domain-gates the metric per the poison-row rule.

A review pass then extended the fixture once more (a FRACTIONAL k and
a DUPLICATE-keyed payload) and pinned two final classes:

10. The engines' string→bigint coercions disagree off the integer
    literal class (Spark try_cast NULLs '1.5'; DuckDB coerces to 2) —
    scalar_json gates extraction on an explicit ^-?[0-9]+$ regex; and
    duplicate JSON keys resolve to OPPOSITE occurrences (Spark map
    reads keep the LAST, DuckDB path lookups the FIRST) — the typed
    shreds and the schema profile gate duplicate-keyed payloads out
    via a key-list distinctness check on both sides. NaN metric values
    stay out of this fixture by the repo's finite-value contract
    (DuckDB v1.0 TRY_CAST raises on NaN; ~20 oracles rely on
    data_expectations gating NaN upstream) — the one defensive
    isfinite oracle guard is pinned by its own planted-NaN test in
    tests/test_streaming.py.

Round 11 planted a near-gate-limit embedding (99009, |x| = 9999.875 —
ADVICE r10's decimal-band concern) and a real contamination pair
(9797/99010), surfacing one more divergence class:

11. DuckDB's DECIMAL(18,6)×DECIMAL(18,6) multiply overflows int64 on
    clean in-domain values near 1e4 (scaled 1e10 squared > 2⁶³) where
    Spark silently widens to DECIMAL(38,12) — pca_project_2d's moment
    products now multiply in DOUBLE (one exactly-rounded op, identical
    bits both engines) and decimal-cast once, behind an |x| < 1e4
    element gate (the mahalanobis/pq discipline, also tightened from
    1e6/1e5 to 1e4 this round so x²·1e6 stays under 2⁵³).

A round-12 audit swept Unicode case folding (uppercase diacritics,
Cyrillic, the ẞ/ß pair, the ǅ titlecase digraph — all MATCH) and
found one DOCUMENTED-KNOWN divergence that is deliberately NOT
planted in the fixture:

12. Turkish İ (U+0130): Java/Spark lower() follows Unicode
    SpecialCasing ('i' + U+0307 combining dot, TWO code points) while
    DuckDB/utf8proc does the simple 1:1 fold ('i'). U+0130 is the
    ONLY code point with an unconditional multi-char lowercase
    mapping, so the divergent surface is exactly one character.
    Planting it would flip every lower()-based oracle (fingerprints,
    decontamination folds, stopword hits) with no shared-arithmetic
    fix available — the honest contract is instead: corpora
    containing U+0130 must fold it at ingestion (NFKC/ICU casefold),
    as any real multilingual pipeline does before dedup.
    test_edge_cases.py::test_turkish_i_is_the_known_casefold_gap pins
    that the divergence (and its single-char scope) still holds, so
    an engine upgrade that changes either side re-opens the audit
    loudly.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tools.hostile_fixture import build
from tools.parity import compare, duck_con

# every query that diverged in the round-9 hostile sweep, now green
REGRESSION_SET = [
    "anomaly_zscore", "bm25_topk", "chunk_overlap", "contamination_overlap",
    "dedup_cross_snapshot", "dedup_exact", "dedup_minhash_sig",
    "dedup_simhash", "dictionary_encode", "doc_fingerprint",
    "dsir_importance", "embedding_covariance", "embedding_stats",
    "encode_corpus", "event_hopping_window", "event_session",
    "event_session_salted", "event_window", "incremental_rollup",
    "join_skew_salted", "linreg_by_key", "pack_context_windows",
    "paragraph_dedup", "perplexity_unigram", "pmi_collocations",
    "quality_gopher", "quantile_normalize", "readability_flesch",
    "resample_ffill", "scalar_json", "session_window_native",
    "shingle_fingerprints", "streaming_hopping",
    "streaming_incremental_dedup", "streaming_static_join",
    "streaming_topk", "streaming_window", "text_quality",
    "text_repetition", "token_count_est", "variant_shred",
    "vocab_growth_curve", "window_range_frame", "xml_ingest",
    # the whole multimodal family, green under the round-9 ASCII gate
    "multimodal_meta", "multimodal_features", "multimodal_framesample",
    "multimodal_dedup", "multimodal_embed_ann",
    # the timeline-contract wave (real-user NULL-ts event)
    "bounce_rate_daily", "bounce_rate_daily_salted", "markov_transitions",
    "scd2_history", "session_paths_topk", "session_paths_topk_salted",
    # round-10 wave: the ordered sequence the r9 timeline pass missed
    # (phantom opening version from a NULL-ts head row) + the new
    # BOM/emoji doc classes riding the text queries above
    "pit_state_at_event",
    # round-10 additions, green on the extended fixture from day one
    "pca_project_2d", "kmeans_two_rounds",
    "dedup_cross_snapshot_fuzzy", "context_window_lineage",
    "embedding_drift_by_label",
    # round-10 waves 2-5 (evalmetrics, mining, streaming sessions,
    # sampling, attribution, PQ audit, JSON profiling, RFM, pipe
    # syntax, MMR), green on the extended fixture from day one
    "quality_score_auc", "score_calibration_bins",
    "label_agreement_kappa", "benford_first_digit",
    "kaplan_meier_conversion", "copurchase_pairs",
    "embedding_mahalanobis_outliers", "streaming_session_window",
    "weighted_sample_topk", "attribution_position_based",
    "pq_reconstruction_error", "json_schema_profile",
    "rfm_segmentation", "sql_pipe_syntax", "ann_mmr_rerank",
    "orc_scan", "decontaminate_substring", "streaming_stream_left_join",
    "referential_integrity_audit", "seasonality_dow",
    # the type-diverse JSON / float-ulp wave (divergence classes 8-9)
    "json_quarantine", "latency_percentile_bands",
    # round-11 wave: the LLM-pipeline batch + the hll graduation +
    # the decimal-band refits, green on the re-extended fixture
    # (contamination pair, near-gate vector, PII plant) from day one
    "snapshot_novelty", "split_cluster_safe", "pii_scrub_counts",
    "hll_user_reach", "tokenizer_fertility", "effective_token_budget",
    # round-12 wave: the mixture/decontamination/repetition batch +
    # the MLlib MinHash graduation (oracle = exact-shingle truth;
    # the 99005/99006 exact-dup pair and the typography pair exercise
    # it here)
    "mixture_rebalance", "decontaminate_normalized", "repetition_gate",
    "dedup_minhash_mllib",
    # round-12 second wave: the attrition funnel (planted failures for
    # every stage), the reverse-direction contamination report (both
    # planted pairs), the epoch-capped mixture (the '' source's tiny
    # token count exercises the cap branch)
    "quality_filter_funnel", "eval_contamination_report",
    "mixture_epochs",
    # round-12 third wave: the label-noise confusion matrix (NULL/''
    # lang rows keep off-diagonal cells live) and the threshold curve
    # (the planted dup families populate the high bands)
    "lang_metadata_mismatch", "dedup_threshold_sweep",
    # round-13 wave: the fixed-budget production twin of the
    # threshold curve (clamped to full census on this under-budget
    # fixture — non-vacuousness pinned below) and the paraphrase
    # contamination protocol (the 9894/99016 plant)
    "dedup_threshold_sweep_sampled",
    "decontaminate_fuzzy",
    # round-13 second wave: per-source snapshot drift (the NULL/''
    # source rows and the planted docs ride the id-block halves) and
    # the fixed-canvas dHash (planted dup families land at small
    # Hamming; ASCII gate drops the BOM/emoji docs)
    "snapshot_divergence_js",
    "multimodal_dhash_neardup",
    # the exact-collapse-first production ordering (same dHash core)
    "multimodal_dhash_unique",
    # and the same ordering for the fuzzy contamination protocol
    "decontaminate_fuzzy_unique",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    return build(str(tmp_path_factory.mktemp("hostile_sf")))


@pytest.mark.parametrize("name", REGRESSION_SET)
def test_hostile_parity(spark, hostile_dir, name):
    con = duck_con(hostile_dir)
    sdf = E.queries()[name](spark, hostile_dir).toPandas()
    ddf = con.execute(E.oracle_sql()[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, "\n".join(problems)


def test_contamination_pair_hits(spark, hostile_dir):
    """ADVICE r10: decontaminate_substring's recorded parity was
    0-rows-both-sides at every swept SF, so the join/count hit path
    was proven only by a planted unit test. The fixture now carries a
    REAL pair (eval doc 9797, train doc 99010 quoting its normalized
    40-char head verbatim) — the hit path must fire on every sweep."""
    out = E.queries()["decontaminate_substring"](spark, hostile_dir).toPandas()
    assert len(out) > 0
    hit = out[out["doc_id"] == 99010]
    assert len(hit) == 1 and int(hit["n_hits"].iloc[0]) >= 1


def test_normalized_fold_widens_the_net(spark, hostile_dir):
    """Round-12 plant (9603/99012, VERDICT r11 #3b): the typography
    pair differs ONLY in case + em-dash/semicolon punctuation, so the
    punctuation-folded variant must hit it while the whitespace-only
    variant must NOT — proving the fold catches a class the existing
    protocol provably misses, not just re-matching the 9797/99010
    whitespace pair (which both variants hit)."""
    ws = E.queries()["decontaminate_substring"](spark, hostile_dir).toPandas()
    folded = E.queries()["decontaminate_normalized"](spark, hostile_dir).toPandas()
    # the fold catches the typography quote...
    hit = folded[folded["doc_id"] == 99012]
    assert len(hit) == 1 and int(hit["n_hits"].iloc[0]) >= 1
    # ...which the whitespace-only protocol misses
    assert 99012 not in set(ws["doc_id"])
    # and the fold still catches the verbatim whitespace pair
    assert 99010 in set(folded["doc_id"])


def test_sampled_sweep_is_not_vacuous(spark, hostile_dir):
    """The fixed-budget sample must leave the threshold curve
    non-vacuous on the hostile fixture (the vacuous-parity rule). The
    fixture is under the 2000-doc budget, so the keep-threshold
    clamps to keep-everything: the sampled curve must EQUAL the
    full-census curve band-for-band and est_full_pairs must equal
    n_pairs exactly (the clamp identity)."""
    out = E.queries()["dedup_threshold_sweep_sampled"](spark, hostile_dir).toPandas()
    full = E.queries()["dedup_threshold_sweep"](spark, hostile_dir).toPandas()
    assert len(out) >= 1
    assert (out["n_pairs"] >= 1).all()
    assert (out["est_full_pairs"] == out["n_pairs"]).all()
    assert out[["band", "n_pairs"]].values.tolist() == (
        full[["band", "n_pairs"]].values.tolist()
    )


def test_fuzzy_contamination_catches_what_substring_misses(spark, hostile_dir):
    """Round-13 plant (9894/99016): the train doc carries the eval
    item with every ~10th word substituted — no verbatim (or
    typography-folded) 40-char head run survives, so BOTH substring
    protocols must miss it, while doc-level MinHash banding + exact
    Jaccard verification must report it with its similarity evidence
    (the paraphrased-leakage class the fuzzy protocol exists for)."""
    fuzzy = E.queries()["decontaminate_fuzzy"](spark, hostile_dir).toPandas()
    hit = fuzzy[(fuzzy["train_id"] == 99016) & (fuzzy["eval_id"] == 9894)]
    assert len(hit) == 1
    assert 0.5 < float(hit["jaccard"].iloc[0]) < 0.6
    ws = E.queries()["decontaminate_substring"](spark, hostile_dir).toPandas()
    folded = E.queries()["decontaminate_normalized"](spark, hostile_dir).toPandas()
    assert 99016 not in set(ws["doc_id"])
    assert 99016 not in set(folded["doc_id"])
    # and the fuzzy protocol still sees the verbatim-quote pair
    assert 99010 in set(fuzzy["train_id"])
    # the exact-collapse-first production form keeps the plant (its
    # text is unique, so the collapse keeps it verbatim) and reports
    # a subset of the full-corpus relation
    uniq = E.queries()["decontaminate_fuzzy_unique"](spark, hostile_dir).toPandas()
    assert ((uniq["train_id"] == 99016) & (uniq["eval_id"] == 9894)).any()
    assert set(zip(uniq["train_id"], uniq["eval_id"])) <= set(
        zip(fuzzy["train_id"], fuzzy["eval_id"])
    )


def test_snapshot_divergence_is_not_vacuous(spark, hostile_dir):
    """Every source with both snapshot halves must report a FINITE
    positive divergence (JS of distinct crawls is never exactly 0)
    bounded by 1 bit, with consistent vocab accounting."""
    out = E.queries()["snapshot_divergence_js"](spark, hostile_dir).toPandas()
    assert len(out) >= 10
    assert (out["js_bits"] > 0).all() and (out["js_bits"] <= 1.0).all()
    assert (out["vocab_shared"] <= out[["vocab_old", "vocab_new"]].min(axis=1)).all()


def test_dhash_neardup_finds_planted_families(spark, hostile_dir):
    """The fixed-canvas dHash must surface the suffix-variant dup
    families at small Hamming distance (non-vacuous on every sweep)
    and stay within the declared threshold; the exact-collapse-first
    production form must report a SUBSET of the full-corpus relation
    restricted to distinct-content representatives."""
    out = E.queries()["multimodal_dhash_neardup"](spark, hostile_dir).toPandas()
    assert len(out) >= 5
    assert (out["hamming"] <= 6).all()
    assert (out["hamming"] == 0).any()  # shared-prefix exact-grid pairs
    uniq = E.queries()["multimodal_dhash_unique"](spark, hostile_dir).toPandas()
    assert len(uniq) >= 5
    full_pairs = set(zip(out["a_id"], out["b_id"]))
    assert set(zip(uniq["a_id"], uniq["b_id"])) <= full_pairs


def test_repetition_plant_flags_spam_doc(spark, hostile_dir):
    """Doc 99013 (repeated slogan, ~90% duplicated trigram chars) must
    trip repetition_gate's flag in its source group — the base
    sf0.001 corpus flags nothing, so without the plant the gate
    comparison would be vacuously green (the non-vacuous rule)."""
    out = E.queries()["repetition_gate"](spark, hostile_dir).toPandas()
    social = out[out["source"] == "social"]
    assert len(social) == 1 and int(social["n_flagged"].iloc[0]) >= 1


def test_funnel_is_monotone_and_every_stage_bites(spark, hostile_dir):
    """quality_filter_funnel's cumulative gates must be monotonically
    non-increasing per source, and on the hostile fixture every stage
    must reject at least one doc somewhere (token-less docs fail
    content, the spam doc 99013 fails repetition, the PII doc 99011
    fails the scrub gate) — without the plants a stage could go
    silently vacuous."""
    out = E.queries()["quality_filter_funnel"](spark, hostile_dir).toPandas()
    assert len(out) > 0
    for a, b in [
        ("n_docs", "pass_content"),
        ("pass_content", "pass_quality"),
        ("pass_quality", "pass_repetition"),
        ("pass_repetition", "pass_pii"),
    ]:
        assert (out[a] >= out[b]).all(), (a, b)
    tot = out.sum(numeric_only=True)
    assert tot["n_docs"] > tot["pass_content"]
    assert tot["pass_quality"] > tot["pass_repetition"]
    assert tot["pass_repetition"] > tot["pass_pii"]


def test_eval_report_counts_both_planted_pairs(spark, hostile_dir):
    """eval_contamination_report must show the verbatim pair (9797 →
    99010) AND the typography pair (9603 → 99012) as burned eval
    items, each with ≥ 1 training hit, while clean eval items keep
    their affirmative zero rows."""
    out = E.queries()["eval_contamination_report"](spark, hostile_dir).toPandas()
    burned = out.set_index("eval_id")["n_training_hits"]
    assert burned.loc[9797] >= 1
    assert burned.loc[9603] >= 1
    assert (out["n_training_hits"] == 0).any()  # clean rows present


def test_epoch_cap_binds_on_tiny_sources(spark, hostile_dir):
    """mixture_epochs: the hostile fixture's tiny sources ('', books,
    social) must hit the 4-epoch cap while the big uniform sources sit
    near 1 epoch — both branches of the least() exercised — and the
    realized mixture must be a valid distribution."""
    out = E.queries()["mixture_epochs"](spark, hostile_dir).toPandas()
    assert (out["epochs"] == 4.0).any()
    assert (out["epochs"] < 4.0).any()
    assert ((out["epochs"] > 0) & (out["epochs"] <= 4.0)).all()
    assert abs(out["realized_share"].sum() - 1.0) < 1e-4
    assert (out["sampled_tokens"] >= 0).all()


def test_mixture_rebalance_is_a_valid_sampling_config(spark, hostile_dir):
    """Structural invariants of the rebalance output: probabilities in
    (0, 1], at least one binding source keeps everything, shares sum
    to ~1, and no source's post-rebalance tokens exceed what it has."""
    out = E.queries()["mixture_rebalance"](spark, hostile_dir).toPandas()
    assert len(out) > 0
    assert ((out["keep_prob"] > 0) & (out["keep_prob"] <= 1.0)).all()
    assert (out["keep_prob"] == 1.0).any()
    assert abs(out["target_share"].sum() - 1.0) < 1e-4
    assert (out["post_tokens"] <= out["effective_tokens"]).all()


def test_pii_plant_fires_every_class(spark, hostile_dir):
    """Doc 99011 plants all four PII regex classes; the base fixture
    has no digits or '@' at all, so without it pii_scrub_counts'
    hit paths would record only vacuous zero parity (the
    decontaminate_substring lesson)."""
    out = E.queries()["pii_scrub_counts"](spark, hostile_dir).toPandas()
    assert int(out["n_emails"].sum()) >= 2
    assert int(out["n_ssn"].sum()) >= 1
    assert int(out["n_phones"].sum()) >= 1
    assert int(out["n_ipv4"].sum()) >= 2
    assert int(out["chars_redacted"].sum()) > 0
    # clean sources still report affirmatively
    assert (out["docs_with_pii"] == 0).any()


def test_near_gate_vector_in_domain(spark, hostile_dir):
    """ADVICE r10: the decimal-moment queries' domain gates tightened
    from 1e6/1e5 to 1e4 so x²/d2 stay in the exact double→DECIMAL band
    (x·1e6 < 2⁵³). Vector 99009 sits just UNDER the new gate at
    |x| = 9999.875 (x² ≈ 1e8, the top of the exact band): it must stay
    IN domain — and, being ~4 decades beyond the corpus scale, rank as
    label 0's #1 Mahalanobis outlier — with parity still exact."""
    maha = E.queries()["embedding_mahalanobis_outliers"](
        spark, hostile_dir
    ).toPandas()
    top0 = maha[(maha["label"] == 0) & (maha["rnk"] == 1)]
    assert len(top0) == 1 and int(top0["vec_id"].iloc[0]) == 99009


def test_ascii_gate_scope(spark, hostile_dir):
    """The byte==char gate applies ONLY where the oracle replays the
    byte grid as chars (features/framesample/embed_ann); byte length,
    magic, and md5 fingerprints are well-defined for non-ASCII payloads
    and keep the café doc (id 99004) IN the result (ADVICE r10 — the
    oracle limitation no longer narrows engine output)."""
    meta = E.queries()["multimodal_meta"](spark, hostile_dir).toPandas()
    row = meta[meta["doc_id"] == 99004]
    assert len(row) == 1
    text = "fused pair and vt\x0btoken here plus café élève text"
    assert int(row["n_bytes"].iloc[0]) == len(text.encode())
    assert row["magic"].iloc[0] == text.encode()[:4].hex()
    dedup = E.queries()["multimodal_dedup"](spark, hostile_dir).toPandas()
    assert 99004 in set(dedup["keep_id"])
    # the byte-grid queries still gate it out
    feats = E.queries()["multimodal_features"](spark, hostile_dir).toPandas()
    assert 99004 not in set(feats["doc_id"])
    assert 99005 in set(feats["doc_id"])  # ASCII hostile docs stay in
