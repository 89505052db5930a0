"""Physical-plan quality gates — the properties that decide whether a
query survives a 100× scale-up (SURVEY.md north star). These assert on
``explain`` output, not timings, so they hold on any hardware:

* predicate pushdown + column pruning reach the parquet scan,
* O(1)-sized dims broadcast (no shuffle of the fact side for the join),
* top-k plans as TakeOrderedAndProject (no global sort),
* aggregations are partial (map-side combine) before the shuffle,
* hot paths stay inside WholeStageCodegen (no Python row loop).
"""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as E


def plan_of(spark, sf_dir, name, mode="formatted"):
    df = E.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_pred")
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "project_lit")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    # the other 10 lineitem columns must not be read
    assert "l_extendedprice" not in read_schema


def test_small_dim_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_equi")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_multiway")
    # nation and region must broadcast; orders⋈customer may be any strategy
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "topk")
    assert "TakeOrderedAndProject" in plan


def test_aggregation_is_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "wordcount_e2e")
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2
    # (WholeStageCodegen spans only appear in post-execution AQE plans;
    # JVM-only evaluation is asserted by test_no_python_udfs_*)


def test_no_python_udfs_on_relational_paths(spark, sf_dir):
    """Every oracle-checked query must plan without Python evaluation
    (BatchEvalPython/ArrowEvalPython) — UDFs are quarantined to the
    explicitly rows-only multimodal/stateful operators."""
    deliberate_python = {
        "streaming_window",  # streaming plans print differently; covered elsewhere
        "dedup_embedding_cosine",  # vectorized numpy block-matmul kernel —
        # the documented case where mapInPandas IS the fast path
        "udtf_tokenize",  # Python UDTF BY DESIGN — the extension-point demo,
        # scoped to 50 docs; JVM tokenization is what real queries use
        "arrow_udf_reverse",  # Arrow scalar UDF BY DESIGN — same rule,
        # completes the UDF-surface matrix, scoped to 50 docs
        "heavy_hitters",  # the Misra-Gries candidate pass is the sketch
        # (mapInPandas by design); the exact verify phase stays JVM-side
        "udtf_analyze_split",  # polymorphic UDTF BY DESIGN (analyze API
        # demo, scoped to 50 docs)
        "arrow_map_batches",  # mapInArrow BY DESIGN — the batch-fidelity
        # contract for the zero-copy Arrow path
        "python_datasource_scan",  # Python Data Source BY DESIGN — the
        # connector itself is the Python under test
        "python_stream_source",  # Python streaming source BY DESIGN
    }
    for name in sorted(E.oracle_sql()):
        if name in deliberate_python:
            continue
        plan = plan_of(spark, sf_dir, name, mode="simple")
        assert "EvalPython" not in plan, name


def test_verified_dedup_never_broadcasts_corpus_sides(spark, sf_dir):
    """Scale regression guard for the 100× probe OOM: the Jaccard
    verification joins must be sort-merge (spillable), never broadcast —
    the shingle postings are corpus-sized and the static planner's
    estimate of checkpointed frames is unreliable."""
    plan = plan_of(spark, sf_dir, "dedup_lsh_jaccard_verified")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_fuzzy_contamination_verify_is_merge_pinned(spark, sf_dir):
    """decontaminate_fuzzy inherits the lsh_jaccard_verified rule: the
    exact-Jaccard verification joins touch corpus-sized shingle
    postings, so they must be sort-merge (spillable), never broadcast
    (checkpointed-frame statistics mislead the static planner)."""
    plan = plan_of(spark, sf_dir, "decontaminate_fuzzy")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_snapshot_divergence_is_join_free(spark, sf_dir):
    """snapshot_divergence_js: one tokenize Generate → (source, token)
    partial-agg'd conditional counts → per-source window totals → the
    |sources|-row JS aggregate. No join anywhere (the totals ride a
    window over the count table, never a join-back to the corpus)."""
    plan = plan_of(spark, sf_dir, "snapshot_divergence_js", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan
    assert "Window" in plan
    assert "partial" in plan.lower()


def test_dhash_plan_is_python_free_and_joinless_until_buckets(spark, sf_dir):
    """multimodal_dhash_neardup: the 64-bit hash is pure codegen'd JVM
    expressions (no Python evaluator, no mapInPandas), and pair
    generation is the bucket explode shape — no corpus join-back
    (Hamming verifies on band words riding the pair row)."""
    plan = plan_of(spark, sf_dir, "multimodal_dhash_neardup", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan  # the band explode + expand_pairs explodes
    assert "InPandas" not in plan and "PythonUDF" not in plan


def test_dhash_unique_collapses_before_hashing(spark, sf_dir):
    """multimodal_dhash_unique: the content-addressed collapse (one
    partial-agg'd payload groupBy) must sit BELOW the dHash band
    explode — the ordering that keeps the pair census O(1) in the
    replication factor — with the same Python-free, join-free shape."""
    plan = plan_of(spark, sf_dir, "multimodal_dhash_unique", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan
    assert "InPandas" not in plan and "PythonUDF" not in plan
    # the collapse adds its own aggregate pair over the bucket groupBy's
    assert plan.count("HashAggregate") >= 4
    # collapse comes before the band explode in the plan tree (the
    # Generate consumes the aggregated frame)
    assert plan.index("Generate") < plan.rindex("HashAggregate")


def test_fuzzy_unique_collapses_and_stays_merge_pinned(spark, sf_dir):
    """decontaminate_fuzzy_unique: the per-role content collapse (one
    partial-agg'd (text, role) groupBy) feeds the same merge-pinned
    verification pipeline — sort-merge joins, no broadcast of
    corpus-sized posting sides."""
    plan = plan_of(spark, sf_dir, "decontaminate_fuzzy_unique")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_ngram_jaccard_plan_has_no_joins(spark, sf_dir):
    """The set-size join-back was removed (sizes ride the posting
    structs via a doc_id window) — the plan must contain no join at
    all, the shape that cannot mis-broadcast at any scale."""
    plan = plan_of(spark, sf_dir, "dedup_ngram_jaccard")
    assert "Join" not in plan


def test_q8_star_join_single_shuffle(spark, sf_dir):
    """Q8's five dims must all broadcast: the fact table is repartitioned
    exactly once (the final per-year aggregate), never for a join."""
    plan = plan_of(spark, sf_dir, "tpch_q8")
    assert plan.count("SortMergeJoin") == 0
    assert "BroadcastHashJoin" in plan


def test_q10_grouped_topk_takes_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q10")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan  # never sort-everything-then-limit


def test_q21_decorrelates_to_single_aggregate(spark, sf_dir):
    """The EXISTS / NOT EXISTS pair must lower to ONE per-order aggregate
    — no semi/anti self-joins against full lineitem (quadratic in
    per-order fan-out, skew-fragile at scale)."""
    plan = plan_of(spark, sf_dir, "tpch_q21")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    # the countDistinct pair lowers to Catalyst's Expand+gid rewrite,
    # keyed on the order — the single linear pass we want
    assert "Expand" in plan
    assert "o_orderkey" in plan


def test_q13_left_join_survives_right_side_filter(spark, sf_dir):
    """The o_orderpriority predicate lives in the join, not a post-join
    WHERE: the plan must keep the LEFT OUTER (a WHERE would let Catalyst
    rewrite it to inner and drop order-less customers)."""
    plan = plan_of(spark, sf_dir, "tpch_q13")
    assert "LeftOuter" in plan or "RightOuter" in plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval set is MBs against a TB-scale corpus: its distinct grams
    must broadcast into a semi-join, and the corpus side must never be
    shuffled for the join (no sort-merge anywhere)."""
    plan = plan_of(spark, sf_dir, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_sample_topk_is_two_phase(spark, sf_dir):
    """Per-language quota sampling must rank in two exact phases
    ((lang, salt) then lang) so no single task ever sorts a whole
    language's corpus — two Window nodes in the plan."""
    plan = plan_of(spark, sf_dir, "sample_per_lang_topk")
    assert plan.count("Window") >= 2
    assert "_salt" in plan


def test_train_split_is_narrow(spark, sf_dir):
    """Hash split assignment must stay narrow: no join, no window; the
    only wide ops are the 3-group partial-aggregated count/sum and the
    3-row final sort."""
    plan = plan_of(spark, sf_dir, "train_split_hash")
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_minhash_signatures_single_exchange(spark, sf_dir):
    """Signature generation must be narrow until the final partial-agg'd
    groupBy: no Window, no distinct pass, no SortAggregate (the long-MIN
    buffer keeps it hash-aggregable) — one Exchange carrying (doc_id, K
    mins), never shingle text. This is the shape that survived 1000×
    where the window+dropDuplicates form exhausted single-node disk."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_sig", mode="simple")
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert plan.count("Exchange") <= 2  # agg exchange + presentation sort


def test_text_repetition_has_no_window(spark, sf_dir):
    """Bigram formation must stay narrow (index explode + element_at):
    no Window node — the only wide op is the per-doc aggregate."""
    plan = plan_of(spark, sf_dir, "text_repetition", mode="simple")
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_decontaminate_normalized_broadcasts_snippets(spark, sf_dir):
    """The folded variant keeps decontaminate_substring's scale shape:
    the fixed-size eval snippet set broadcasts (nested-loop on the
    contains predicate) and the corpus side is never shuffled for the
    join; fold + match run inside codegen, no Python."""
    plan = plan_of(spark, sf_dir, "decontaminate_normalized")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_gate_is_narrow_aggregation(spark, sf_dir):
    """Trigram build must stay codegen (Generate + element_at — no
    Window, no join anywhere); the three aggregate stages (gram
    counts, per-doc, per-source) all partial-aggregate map-side, and
    key cardinality shrinks monotonically stage to stage."""
    plan = plan_of(spark, sf_dir, "repetition_gate", mode="simple")
    assert "Join" not in plan and "Window" not in plan
    assert "Generate" in plan
    assert plan.count("HashAggregate") >= 4  # partial/final pairs
    assert "partial" in plan.lower()


def test_lang_mismatch_is_join_free(spark, sf_dir):
    """lang_metadata_mismatch inherits lang_pred_frame's no-join-back
    shape (stored label rides the groupBy key); the matrix agg is
    vocabulary-sized and partial-aggregated."""
    plan = plan_of(spark, sf_dir, "lang_metadata_mismatch", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan  # the single shared tokenization explode
    assert "partial" in plan.lower()


def test_threshold_sweep_inherits_posting_shape(spark, sf_dir):
    """dedup_threshold_sweep composes dedup_ngram_jaccard verbatim, so
    its plan must keep the inverted-index invariant: no corpus-sized
    join anywhere (posting lists + expression-side pair expansion),
    with the banding a tiny aggregate on top."""
    plan = plan_of(spark, sf_dir, "dedup_threshold_sweep", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan  # expand_pairs' streaming explodes


def test_sampled_sweep_filters_before_shingling(spark, sf_dir):
    """dedup_threshold_sweep_sampled: the hash-budget filter must sit
    ON the document scan (before the shingle Generate), so postings,
    pair expansion, and everything downstream shrink at the source —
    the property that makes the budget form O(budget²) instead of
    O(corpus²). Same join-free posting shape as the census sweep."""
    plan = plan_of(spark, sf_dir, "dedup_threshold_sweep_sampled", mode="simple")
    assert "Join" not in plan
    assert "Generate" in plan
    # the md5-hash sample predicate appears as a scan-side Filter
    assert "conv(substring(md5" in plan.replace(" ", "").lower() or "conv" in plan


def test_sweep_keep_threshold_math():
    """Clamp and ceil-div edges of the budget threshold (mirrored in
    the oracle's integer arithmetic)."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        _SWEEP_HASH_MOD,
        _SWEEP_SAMPLE_BUDGET,
        _sweep_keep_threshold,
    )

    assert _sweep_keep_threshold(0) == _SWEEP_HASH_MOD  # empty corpus
    assert _sweep_keep_threshold(1) == _SWEEP_HASH_MOD  # under budget
    assert _sweep_keep_threshold(_SWEEP_SAMPLE_BUDGET) == _SWEEP_HASH_MOD
    # 5000 docs at budget 2000 → exactly the 40% keep band
    assert _sweep_keep_threshold(5_000) == 400_000
    # ceil, not floor: 500k docs → 4000 (exact); 500k+1 → still 4000
    assert _sweep_keep_threshold(500_000) == 4_000
    assert _sweep_keep_threshold(500_001) == 4_000
    assert _sweep_keep_threshold(3) == _SWEEP_HASH_MOD


def test_mixture_epochs_rebalances_on_tiny_frame(spark, sf_dir):
    """Same contract as mixture_rebalance: corpus work = the composed
    effective_token_budget plan; the epoch math runs on the
    |sources|-row frame; no join anywhere."""
    plan = plan_of(spark, sf_dir, "mixture_epochs")
    assert "Join" not in plan
    assert "SinglePartition" in plan
    assert plan.count("Window") >= 2


def test_funnel_join_is_merge_not_broadcast(spark, sf_dir):
    """quality_filter_funnel's flags⋈repetition join has two
    corpus-sized per-doc sides: the merge hint must hold so size
    estimates can never pick a broadcast that 100 TB invalidates
    (the snapshot_novelty rule), and the flag inputs stay codegen —
    no Python anywhere."""
    plan = plan_of(spark, sf_dir, "quality_filter_funnel")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_eval_report_broadcasts_only_eval_frames(spark, sf_dir):
    """eval_contamination_report: the corpus-side hit count joins the
    BROADCAST eval snippets (nested-loop on contains); the zero-row
    restoration joins two eval-suite-sized frames — no sort-merge may
    ever touch the corpus."""
    plan = plan_of(spark, sf_dir, "eval_contamination_report")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mixture_rebalance_rebalances_on_tiny_frame(spark, sf_dir):
    """The corpus-scale work is exactly the composed
    effective_token_budget plan (fp window + |sources|-key agg); the
    rebalance math (Σ√E window, min-budget window) must run on the
    POST-aggregation |sources|-row frame — the SinglePartition
    exchange is tiny by construction — and no join exists anywhere."""
    plan = plan_of(spark, sf_dir, "mixture_rebalance")
    assert "Join" not in plan
    assert "SinglePartition" in plan
    assert plan.count("Window") >= 2  # fp keep-mark + whole-frame math


def test_vector_hot_paths_not_interpreted(spark, sf_dir):
    """Round-2 fix for VERDICT item #2: corpus-scale vector scoring must
    run in the Arrow-batched numpy kernels (MapInPandas), never as
    interpreted higher-order-function folds — no ZipWith/ArrayAggregate
    anywhere in these plans."""
    for name in ("cosine_knn_exact", "ann_lsh_topk", "ann_ivf_topk",
                 "multimodal_embed_ann", "dedup_embedding_cosine_bucketed"):
        plan = plan_of(spark, sf_dir, name, mode="extended")
        # every array HOF (zip_with / aggregate / transform lambdas)
        # prints a lambdafunction(...) node — there must be none
        assert "lambdafunction" not in plan.lower(), name
        assert "zip_with" not in plan.lower(), name
        assert "MapInPandas" in plan, name


def test_knn_exact_has_no_join_no_corpus_shuffle(spark, sf_dir):
    """The broadcast-matmul knn: corpus streams through one narrow
    MapInPandas; no join node at all, and the only Exchange ranks the
    pre-pruned |batches|·|q|·k candidate rows."""
    plan = plan_of(spark, sf_dir, "cosine_knn_exact", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # candidate rank + presentation sort


def test_keep_best_is_aggregate_not_window(spark, sf_dir):
    """dedup_keep_best's docstring claims the max_by-struct form: a
    partial-aggregable MAX, never a per-key row_number sort."""
    plan = plan_of(spark, sf_dir, "dedup_keep_best")
    assert "Window" not in plan
    assert "partial_max" in plan or "partial" in plan.lower()


def test_hopping_window_is_scan_side_generate(spark, sf_dir):
    """Window assignment must expand scan-side (Expand/Generate), not
    via a join against a window table; the count/sum must partial-agg."""
    plan = plan_of(spark, sf_dir, "event_hopping_window")
    assert "Join" not in plan
    assert "partial" in plan.lower()


def test_embedding_stats_stays_codegen(spark, sf_dir):
    """posexplode → partial agg; no interpreted higher-order fold, no
    Python evaluation."""
    plan = plan_of(spark, sf_dir, "embedding_stats")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "lambdafunction"):
        assert marker not in plan
    assert "partial" in plan.lower()


def test_q2_broadcasts_dims_only(spark, sf_dir):
    """region/nation broadcast; the lineitem-derived costs table must
    never be the broadcast side of its self-join-back."""
    plan = plan_of(spark, sf_dir, "tpch_q2")
    assert "BroadcastHashJoin" in plan


def test_q20_decorrelates_to_single_aggregate(spark, sf_dir):
    """The nested-IN shape must lower to one (suppkey, partkey) agg +
    semi-join — no correlated per-supplier rescan of lineitem."""
    plan = plan_of(spark, sf_dir, "tpch_q20")
    assert plan.count("LeftSemi") >= 1
    assert "partial" in plan.lower()


def test_o11_output_path_is_jvm_sorted(spark, tmp_path):
    """The faithful O11 write (round-2 VERDICT "What's wrong" #1): the
    per-reducer sort must be Tungsten's spillable in-partition Sort after
    one exchange on pid — no Python evaluation (the old path buffered a
    whole reducer partition through a Python sorted()), and the leading
    pid sort key means the partition-by-value writer inserts no second,
    order-destroying sort."""
    from pyspark.sql import functions as F

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.operators.mapreduce import (
        JobConfig,
        wordcount_df,
    )

    p = tmp_path / "in.txt"
    p.write_text("a b c \nd e f \n")
    cfg = JobConfig(
        "wc", 3, 0, str(p), 1, None, str(tmp_path / "out"),
        partition_fn="first_char",
    )
    staged = (
        wordcount_df(spark, cfg)
        .repartition(cfg.num_reducer, "pid")
        .sortWithinPartitions(F.col("pid").asc(), F.col("word").asc(), F.col("cnt").asc())
        .select("pid", F.concat_ws(" ", "word", "cnt").alias("value"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        staged.explain("formatted")
    plan = buf.getvalue()
    # no Python evaluation anywhere past the O1 text-chunking source
    # (which legitimately builds chunk ids via an RDD zipWithIndex)
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    # the reducer sort is a JVM in-partition Sort keyed (pid, word, cnt)
    sort_args = plan.split("Sort\n")[1].splitlines()[1]
    assert "pid" in sort_args and "word" in sort_args and "cnt" in sort_args
    # exactly one pid exchange on top of the aggregation's own shuffle
    assert plan.count("REPARTITION_BY_NUM") == 1


def test_bloom_bits_ride_broadcast_not_plan(spark, sf_dir):
    """decontaminate_bloom (round-2 VERDICT #3): the bloom bit array
    must ship as broadcast DATA (one-row BroadcastNestedLoopJoin), not
    as thousands of inlined literals bloating the expression tree. A
    compact plan string is the observable: the old form printed every
    word of the bit array."""
    plan = plan_of(spark, sf_dir, "decontaminate_bloom")
    assert "BroadcastNestedLoopJoin" in plan
    assert len(plan) < 50_000, f"plan string is {len(plan)} chars — literal bloat?"
    # exactness is still restored by the broadcast semi-join on grams
    assert "LeftSemi" in plan


def test_substring_dup_rate_no_join_no_hof(spark, sf_dir):
    """The duplication diagnostic must build grams with the narrow
    index-explode (no interpreted higher-order ArrayTransform) and
    reach its counts without any corpus join — the only join is the
    final 1x1 crossJoin stitching two scalar aggregates."""
    plan = plan_of(spark, sf_dir, "substring_dup_rate", mode="simple")
    assert "ArrayTransform" not in plan
    # the only joins are broadcast-nested-loop over single-row sides
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_quality_gopher_single_shuffle_no_expand(spark, sf_dir):
    """Gopher flags: one explode -> one partial-agg'd groupBy. A
    distinct aggregate would plan an Expand over the token stream; the
    per-stopword MAX flags must keep it out."""
    plan = plan_of(spark, sf_dir, "quality_gopher", mode="simple")
    assert "Expand" not in plan
    assert "Join" not in plan
    # one agg exchange + the presentation sort's range exchange
    assert plan.count("Exchange") <= 2
    assert "partial_" in plan  # map-side combine before the doc shuffle


def test_perplexity_join_is_vocab_keyed(spark, sf_dir):
    """The LM-score join keys on the word (vocab side), never shuffles
    the documents table's text column, and both aggs are partial."""
    plan = plan_of(spark, sf_dir, "perplexity_unigram", mode="simple")
    assert "partial_count" in plan
    # no full-text column crosses a shuffle: text is consumed by the
    # explode before any Exchange
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_mixture_sample_is_two_phase_with_broadcast_quotas(spark, sf_dir):
    """Quotas broadcast onto the scan (no corpus shuffle for the join)
    and the rank fill is the salted two-phase top-K: two window sorts,
    the first keyed on (source, salt)."""
    plan = plan_of(spark, sf_dir, "mixture_sample_temperature", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "_salt" in plan


def test_bm25_single_corpus_agg_and_takeordered(spark, sf_dir):
    """BM25: per-term tfs ride ONE conditional-count hash aggregate (no
    posting-list self-join), corpus stats broadcast, and the top-k is a
    TakeOrderedAndProject, never a global sort."""
    plan = plan_of(spark, sf_dir, "bm25_topk", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan  # only the 1-row stats BNLJ
    assert "partial_count" in plan


def test_dsir_joins_stay_broadcast(spark, sf_dir):
    """DSIR: the B-row log-weight table must broadcast onto the gram
    stream; a sort-merge join here would shuffle the corpus by hash
    bucket for no reason."""
    plan = plan_of(spark, sf_dir, "dsir_importance", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_contamination_overlap_broadcasts_eval_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "contamination_overlap", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anomaly_zscore_no_window_no_event_shuffle(spark, sf_dir):
    """Per-type stats join back via broadcast — the event scan itself is
    never hash-partitioned, and no Window operator (which would sort
    every partition) appears."""
    plan = plan_of(spark, sf_dir, "anomaly_zscore", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert " Window" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_encode_single_python_stage_no_shuffle(spark, sf_dir):
    """PQ encoding is one Arrow-batched python stage over the scan; the
    only exchange is the presentation sort's range partitioning."""
    plan = plan_of(spark, sf_dir, "pq_encode", mode="simple")
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_pmi_reuses_vocab_exchange_and_takeordered(spark, sf_dir):
    """PMI: top-k must be TakeOrdered; totals must come from a singleton
    agg (no whole-vocab Window, which would single-partition a web-scale
    vocabulary)."""
    plan = plan_of(spark, sf_dir, "pmi_collocations", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert " Window" not in plan


def test_funnel_is_two_aggregates_no_join(spark, sf_dir):
    """First-touch funnel: conditional MINs per user then a singleton
    agg — any Join or Window here means a self-join crept in."""
    plan = plan_of(spark, sf_dir, "funnel_conversion", mode="simple")
    assert "Join" not in plan
    assert " Window" not in plan
    assert "partial_min" in plan


def test_retention_join_is_user_keyed(spark, sf_dir):
    """Cohorts: the events⋈first_seen join must key on user_id (broadcast
    at fixture scale, co-partitioned sort-merge beyond), never a
    nested-loop."""
    plan = plan_of(spark, sf_dir, "retention_cohorts", mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_multimodal_dedup_is_one_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "multimodal_dedup", mode="simple")
    assert "Join" not in plan
    assert "partial_count" in plan


def test_window_range_frame_single_user_shuffle(spark, sf_dir):
    """RANGE frame: one hash exchange on user_id + the per-partition
    ordered sweep — a self-join here would be the quadratic plan the
    frame exists to avoid."""
    plan = plan_of(spark, sf_dir, "window_range_frame", mode="simple")
    assert "Join" not in plan
    assert " Window" in plan


def test_zorder_is_scan_side_with_broadcast_stats(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "zorder_layout", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # stats ride a 1-row broadcast


def test_snapshot_diff_is_fingerprint_only_merge_join(spark, sf_dir):
    """CDC: both corpus-sized fingerprint sides pinned sort-merge (a
    broadcast guess here OOMs at 100 TB), text never past the scan."""
    plan = plan_of(spark, sf_dir, "snapshot_diff")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_scd2_single_user_exchange_two_windows(spark, sf_dir):
    """SCD-2: both window passes must reuse ONE hashpartitioning(user_id)
    exchange — a second exchange means the collapse/stamp passes
    repartitioned and the plan shuffles the log twice."""
    plan = plan_of(spark, sf_dir, "scd2_history", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count(" Window ") + plan.count("+- Window") >= 2


def test_compaction_bins_one_shuffle_then_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "compaction_bins", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert "partial_count" in plan and "partial_sum" in plan


def test_data_expectations_checks_prune_and_push(spark, sf_dir):
    """Every constraint reads only its own columns; range predicates
    reach the parquet scan; the FK check is a real anti-join."""
    plan = plan_of(spark, sf_dir, "data_expectations")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "ReadSchema: struct<n_chars:bigint>" in plan  # single-column scans
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]" in plan
    assert "LeftAnti" in plan


def test_paragraph_dedup_text_stays_scan_side(spark, sf_dir):
    """Only (md5, doc_id, idx) ride the shuffles: the winner-per-chunk
    agg is partial, and chunk text is re-sliced scan-side after a
    doc_id-keyed merge join — never collected through the exchange."""
    plan = plan_of(spark, sf_dir, "paragraph_dedup", mode="simple")
    assert "partial_min" in plan and "partial_collect_list" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_plan_is_constant_size_across_iterations(spark, sf_dir):
    """Each iteration localCheckpoints, so the FINAL plan must be a
    checkpoint scan + project — if rounds 1..k leaked into it, Catalyst
    re-analysis would grow per-iteration (the dedup_clusters rule)."""
    plan = plan_of(spark, sf_dir, "pagerank_events", mode="simple")
    assert "ExistingRDD" in plan
    assert "Join" not in plan  # all joins happened before the checkpoint


def test_triangle_count_equi_joins_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "triangle_count", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_table_profile_prunes_each_column_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "table_profile")
    assert "ReadSchema: struct<l_returnflag:string>" in plan
    assert "ReadSchema: struct<l_linestatus:string>" in plan
    assert "partial_count" in plan


def test_heavy_hitters_semi_joins_broadcast_candidates(spark, sf_dir):
    """The verify scan must filter tokens by a BROADCAST semi-join on
    the sketch candidates (asserted on the lazy pre-checkpoint plan),
    and the returned top-k must be a TakeOrdered over the pinned
    candidate counts — never a full-vocab sort or corpus re-scan."""
    import io
    from contextlib import redirect_stdout

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.text import (
        _hh_sketch_and_verify,
    )

    _, _, counted_lazy = _hh_sketch_and_verify(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        counted_lazy.explain("simple")
    verify_plan = buf.getvalue()
    assert "LeftSemi" in verify_plan and "Broadcast" in verify_plan
    # the candidate side is the checkpointed sketch, not a corpus re-scan
    assert "ExistingRDD" in verify_plan or "LocalTableScan" in verify_plan

    plan = plan_of(spark, sf_dir, "heavy_hitters", mode="simple")
    assert "TakeOrderedAndProject" in plan
    # final top-k reads the pinned candidate counts (bounded), no corpus scan
    assert "ExistingRDD" in plan
    assert "parquet" not in plan.lower()


def test_attribution_single_window_sweep_no_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "attribution_last_touch", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert " Window" in plan or "+- Window" in plan


def test_pca_project_is_shuffle_free(spark, sf_dir):
    """Both PCA passes are narrow mapInPandas scans — any hash exchange
    means a shuffle crept into a zero-shuffle pipeline."""
    plan = plan_of(spark, sf_dir, "pca_project", mode="simple")
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan


def test_dictionary_encode_window_is_bucket_partitioned(spark, sf_dir):
    """The rank window must partition by the range-bucket id — an
    unpartitioned row_number() is the single-task global-sort trap this
    operator exists to avoid."""
    plan = plan_of(spark, sf_dir, "dictionary_encode", mode="extended")
    assert "windowspecdefinition(pid" in plan


def test_ndcg_rankings_are_takeordered(spark, sf_dir):
    """Both ranking selections must TakeOrdered 10 rows before any
    window — the position windows run over k rows, never the corpus."""
    plan = plan_of(spark, sf_dir, "ndcg_at_10", mode="simple")
    assert plan.count("TakeOrderedAndProject") == 2


def test_reachability_uses_native_recursion(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "reachability_bfs", mode="simple")
    assert "UnionLoop" in plan


def test_k_anonymity_is_one_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "k_anonymity_suppress", mode="simple")
    assert "Join" not in plan
    assert "partial_count" in plan


def test_merge_upsert_is_pk_keyed_sort_merge(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "merge_upsert")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan


def test_linreg_single_partial_agg_no_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "linreg_by_key", mode="simple")
    assert "Join" not in plan
    assert "partial_sum" in plan and "partial_count" in plan


def test_json_quarantine_stays_jvm_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "json_quarantine", mode="simple")
    assert "EvalPython" not in plan  # from_json is codegen, not a UDF
    assert "partial_count" in plan


def test_encode_corpus_broadcasts_dictionary(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "encode_corpus", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_embedding_covariance_shuffle_is_cell_keyed(spark, sf_dir):
    """The covariance shuffle carries d(d+1)/2 cell keys, never vectors:
    the aggregate must partial-combine before its exchange."""
    plan = plan_of(spark, sf_dir, "embedding_covariance", mode="simple")
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_bpe_first_merge_is_vocab_sized_takeordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "bpe_first_merge", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan


def test_pit_join_is_windowed_union_not_inequality_join(spark, sf_dir):
    """The PIT lookup must plan as union + user-keyed window — any Join
    node means the quadratic inequality formulation crept back."""
    plan = plan_of(spark, sf_dir, "pit_state_at_event", mode="simple")
    assert "Join" not in plan
    assert "Union" in plan
    # two user-keyed exchanges: one derives version boundaries (lag
    # window), one re-partitions the union for the carry window. With a
    # MATERIALIZED scd2 table the first disappears; what matters is no
    # third shuffle and no join node.
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_skew_report_is_one_histogram_plus_takeordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "skew_report", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan  # stats ride a broadcast


def test_nullsafe_join_still_hashes(spark, sf_dir):
    """eqNullSafe must plan as a hash join on the null-tagged key —
    a BroadcastNestedLoopJoin here means the comparator fell off the
    equi-join path."""
    plan = plan_of(spark, sf_dir, "join_nullsafe_keys", mode="simple")
    # both the plain and null-safe joins hash; Catalyst rewrites the
    # null-safe comparator to (coalesce(k, 0), isnull(k)) hash keys
    assert plan.count("BroadcastHashJoin") == 2
    assert "coalesce(k" in plan and "isnull(k" in plan
    # the only nested-loop node is the final 1-row x 1-row combine
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_parameterized_sql_pushes_bound_predicates(spark, sf_dir):
    """Named parameters must land in the parquet scan's PushedFilters
    exactly like hand-written literals."""
    plan = plan_of(spark, sf_dir, "sql_parameterized")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "l_quantity" in pushed and "l_discount" in pushed


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """The SQL UDF body must inline — no UDF/EvalPython node, and the
    scoring arithmetic visible in the plan's projection."""
    plan = plan_of(spark, sf_dir, "sql_udf_scoring")
    assert "EvalPython" not in plan
    assert "least" in plan  # the inlined function body


def test_decayed_engagement_single_partial_agg(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "decayed_engagement", mode="simple")
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan  # t_ref rides a 1-row broadcast


def test_sliding_distinct_dedupes_before_fanout(spark, sf_dir):
    """The ×24 explode must consume the DISTINCT (hour, user) pairs —
    an explode directly over events fans out k×24 per active user-hour."""
    plan = plan_of(spark, sf_dir, "sliding_distinct_users", mode="simple")
    assert "Generate explode" in plan or "Generate" in plan
    # the aggregate beneath the explode is the pair-dedupe
    gen_at = plan.index("Generate")
    assert "HashAggregate" in plan[gen_at:]
    # r6: the hour-spine semi-join must BROADCAST (time-span-bounded
    # side) so the (h, user) dedupe partial-aggregates map-side; a
    # merge join here sorts every exploded row before any reduction
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_url_canonicalize_is_scan_plus_one_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "url_canonicalize", mode="simple")
    assert "Join" not in plan
    assert "partial_count" in plan and "partial_min" in plan


def test_anomaly_mad_scan_never_shuffles(spark, sf_dir):
    """Both percentile passes reduce to per-type rows that broadcast
    back — the event scan itself must not hash-exchange."""
    plan = plan_of(spark, sf_dir, "anomaly_mad", mode="simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange hashpartitioning(event_id" not in plan


def test_schema_evolution_merges_both_generations(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "schema_evolution_scan")
    # merged read schema includes the evolved column
    assert "quality:bigint" in plan.split("ReadSchema")[1].splitlines()[0]


def test_value_histogram_broadcasts_extents(spark, sf_dir):
    """The per-type extent aggregate must broadcast back onto the event
    scan (anomaly_zscore idiom) — the big side is never shuffled before
    the bin groupBy, and the filter pushes to the scan."""
    plan = plan_of(spark, sf_dir, "value_histogram", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(event_id" not in plan
    assert "PushedFilters: [IsNotNull(event_type)]" in plan


def test_drift_ks_is_joinless_two_shrinking_exchanges(spark, sf_dir):
    """KS must compute both CDFs from ordered windows per type — no
    pairwise join anywhere. Exactly two hash exchanges: the (type,
    value) count aggregate (partial-combined map-side, so the wire
    carries distinct values, not events) and the per-type window over
    the already-shrunken count table."""
    plan = plan_of(spark, sf_dir, "drift_ks_test", mode="simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_sum" in plan  # map-side combine before the big shuffle


def test_session_paths_windows_share_one_user_exchange(spark, sf_dir):
    """Sessionizer window ((user)) and path windows ((user, sid)) must
    share a single user-keyed exchange — partitioning by user_id
    already clusters (user_id, sid) — and the top-10 must be a
    TakeOrdered, never a global sort."""
    plan = plan_of(spark, sf_dir, "session_paths_topk", mode="simple")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_session_paths_salted_never_partitions_by_bare_user(spark, sf_dir):
    """The whale-immune variant must key EVERY window by (user_id, bkt)
    — a bare user_id exchange would re-create the single-task whale
    ceiling SCALING.md measures (19.7 s at 100× on one key)."""
    import re

    plan = plan_of(spark, sf_dir, "session_paths_topk_salted", mode="simple")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "user_id" in keys:
            assert "bkt" in keys, f"bare-user exchange found: {keys}"
    assert "TakeOrderedAndProject" in plan


def _boundary_corpus(spark, tmp_path) -> str:
    """Events parquet dir hitting every (user, day)-bucket time-split
    edge: sessions spanning midnight, a lone-event day between two
    active days, empty days, a gap of exactly 30 min (same session:
    threshold is strict >), a whale user, and equal-ts ties resolved
    by event_id. Shared by the salted-vs-unsalted equivalence tests."""
    import datetime as dt

    rows = []
    eid = 0

    def ev(user, t, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, t, user, typ, 0.0, "{}"))

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    # user 1: one long session crossing midnight (10-min steps, 23:40 → 00:20)
    for i in range(7):
        ev(1, dt.datetime(2024, 3, 1, 23, 40) + i * dt.timedelta(minutes=10), "a" if i % 2 else "b")
    # user 2: active day, then a SINGLE event next day within 30 min of
    # midnight on both sides is impossible — instead: last event 23:50,
    # lone event next day 00:10 (same session), next event day+2 00:20
    # (gap > 1 day ⇒ new session)
    ev(2, dt.datetime(2024, 3, 3, 23, 30), "a")
    ev(2, dt.datetime(2024, 3, 3, 23, 50), "b")
    ev(2, dt.datetime(2024, 3, 4, 0, 10), "a")
    ev(2, dt.datetime(2024, 3, 6, 0, 20), "b")
    ev(2, dt.datetime(2024, 3, 6, 0, 30), "a")
    ev(2, dt.datetime(2024, 3, 6, 0, 40), "b")
    # user 3: gap of EXACTLY 30 min (same session — strict >), then 30
    # min + 1 µs (new session)
    t0 = dt.datetime(2024, 3, 10, 12, 0, 0)
    ev(3, t0, "a")
    ev(3, t0 + dt.timedelta(minutes=30), "b")
    ev(3, t0 + dt.timedelta(minutes=60), "a")
    ev(3, t0 + dt.timedelta(minutes=90, microseconds=1), "b")
    ev(3, t0 + dt.timedelta(minutes=100), "a")
    ev(3, t0 + dt.timedelta(minutes=110), "b")
    # user 4: whale — 500 events at 5-min steps spanning ~2 days
    for i in range(500):
        ev(4, base + dt.timedelta(days=20) + i * dt.timedelta(minutes=5), "a" if i % 3 else "b")
    # user 5: equal-ts ties (3 events, same µs) — order by event_id
    tie = dt.datetime(2024, 3, 28, 23, 59, 59)
    ev(5, tie, "b")
    ev(5, tie, "a")
    ev(5, tie, "b")
    ev(5, dt.datetime(2024, 3, 29, 0, 1), "a")

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(d + "/events.parquet")
    return d


def test_session_paths_salted_equals_unsalted_on_boundary_corpus(spark, tmp_path):
    """Full-distribution parity between the salted (day-bucketed,
    boundary-replicated) plan and the unsalted per-user plan on the
    boundary corpus. Two event types keep the distinct-path count ≤ 8,
    so the top-10 IS the full distribution."""
    d = _boundary_corpus(spark, tmp_path)
    unsalted = E.queries()["session_paths_topk"](spark, d).collect()
    salted = E.queries()["session_paths_topk_salted"](spark, d).collect()
    assert [tuple(r) for r in unsalted] == [tuple(r) for r in salted]
    # fewer than 10 distinct paths exist, so the compared top-10 was the
    # FULL distribution, not a truncation that could mask a count drift
    assert 4 <= len(salted) < 10


def test_bounce_rate_salted_equals_unsalted_on_boundary_corpus(spark, tmp_path):
    """The two-level salted bounce plan (bucket-local runs + dimension-
    scale chain stitch) must reproduce the unsalted sessionizer exactly
    on the boundary corpus — midnight-spanning sessions exercise the
    r=0 chain attach, the lone-event day between active days exercises
    a single-run bucket that is both r=0 and max_r, and the whale user
    exercises multi-day chains."""
    d = _boundary_corpus(spark, tmp_path)
    unsalted = E.queries()["bounce_rate_daily"](spark, d).collect()
    salted = E.queries()["bounce_rate_daily_salted"](spark, d).collect()
    assert [tuple(r) for r in unsalted] == [tuple(r) for r in salted]
    assert len(salted) >= 5  # several distinct days → non-trivial compare


def test_twap_salted_equals_unsalted_on_boundary_corpus(spark, tmp_path):
    """The summary-stitch salted TWAP must reproduce the unsalted LEAD
    window exactly on the boundary corpus — the lone-event day and the
    >1-day gaps exercise the case day-bucket replication cannot serve
    (a holding period spanning EMPTY days must still reach the next
    non-empty bucket's first event), and equal-ts ties exercise the
    min-timestamp summary."""
    d = _boundary_corpus(spark, tmp_path)
    unsalted = E.queries()["time_weighted_avg"](spark, d).collect()
    salted = E.queries()["time_weighted_avg_salted"](spark, d).collect()
    # sorted: both queries dropped their presentation-only terminal
    # sort in round 13 (the driver hash is order-insensitive), so the
    # equality contract here is set-of-rows, not emission order
    assert sorted(tuple(r) for r in unsalted) == sorted(
        tuple(r) for r in salted
    )
    assert len(salted) == 5  # every user has ≥2 events → a weighted row


def test_twap_salted_event_scale_exchanges_are_bucketed(spark, sf_dir):
    """Whale-immunity plan pin for the salted TWAP: the event-scale
    LEAD window and the summary join are (user_id, bkt)-keyed; bare
    user_id exchanges are allowed only for dimension-scale work (the
    ≤1-row-per-user-day summary stitch window and the final merge of
    user-sized aggregate partials — which must be partial-combined
    map-side before it)."""
    import re

    plan = plan_of(spark, sf_dir, "time_weighted_avg_salted", mode="simple")
    bare = sum(
        1
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        if "user_id" in m.group(1) and "bkt" not in m.group(1)
    )
    assert bare <= 2, f"{bare} bare-user exchanges — event-scale window leaked"
    assert "partial_sum" in plan  # weighted sums combine before the merge


def test_bounce_rate_salted_event_scale_exchanges_are_bucketed(spark, sf_dir):
    """Whale-immunity plan pin: every exchange keyed by user_id must
    either include the day bucket (the event-scale sessionizer windows)
    or be the single run-table stitch — which is dimension-scale (≤2
    rows per user-day) by construction, so ONE bare-user exchange is
    the allowed maximum."""
    import re

    plan = plan_of(spark, sf_dir, "bounce_rate_daily_salted", mode="simple")
    bare = 0
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "user_id" in keys and "bkt" not in keys:
            bare += 1
    assert bare <= 1, f"{bare} bare-user exchanges — event-scale window leaked"


def test_event_session_salted_equals_unsalted_on_boundary_corpus(spark, tmp_path):
    """The simplest `_day_bucketed` consumer must reproduce the
    unsalted per-user sessionizer exactly on the boundary corpus —
    midnight-spanning sessions exercise the fwd replica's lag feed
    (without it the bucket's first own row would miscount a session
    start), the exact-30-min gap exercises the strict-> threshold, and
    equal-ts ties exercise the (ts, event_id) order."""
    d = _boundary_corpus(spark, tmp_path)
    unsalted = E.queries()["event_session"](spark, d).collect()
    salted = E.queries()["event_session_salted"](spark, d).collect()
    # sorted: both queries dropped their presentation-only terminal
    # sort in round 13 (the driver hash is order-insensitive), so the
    # equality contract here is set-of-rows, not emission order
    assert sorted(tuple(r) for r in unsalted) == sorted(
        tuple(r) for r in salted
    )
    assert len(salted) == 5  # one row per corpus user


def test_event_session_salted_event_scale_exchanges_are_bucketed(spark, sf_dir):
    """Whale-immunity plan pin: the sessionizer's lag window must be
    (user_id, bkt)-keyed; the only bare-user exchange allowed is the
    final rollup's merge, which must be partial-combined map-side (a
    whale's rows collapse to one partial per partition before the
    shuffle)."""
    import re

    plan = plan_of(spark, sf_dir, "event_session_salted", mode="simple")
    bare = 0
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "user_id" in keys and "bkt" not in keys:
            bare += 1
    assert bare <= 1, f"{bare} bare-user exchanges — event-scale window leaked"
    assert "partial_sum" in plan  # rollup combines before the merge


def test_quality_deciles_matches_spark_ntile_on_awkward_n(spark, tmp_path):
    """The distributed rank + ntile arithmetic must reproduce Spark's
    own NTILE(10) bit-for-bit when N is NOT divisible by 10 (remainder
    tiles take one extra row) and ties are heavy (ranks split tie
    groups across tiles)."""
    from pyspark.sql import Window, functions as F

    rows = [(i, "x" * (1 + (i * 7) % 5)) for i in range(23)]  # N=23, 5 distinct lengths
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "corpus")
    docs.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {r["decile"]: (r["n_docs"], r["min_chars"], r["max_chars"])
           for r in E.queries()["quality_deciles"](spark, d).collect()}
    w = Window.orderBy(F.col("n_chars").desc(), "doc_id")
    want = {
        r["decile"]: (r["n_docs"], r["min_chars"], r["max_chars"])
        for r in docs.select("n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_docs"), F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
        .collect()
    }
    assert got == want
    # remainder rule: first N%10=3 tiles hold 3 rows, the rest 2
    assert [got[k][0] for k in sorted(got)] == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]


def _decile_oracle_compare(spark, tmp_path, name, docs_rows):
    """Run a quality-decile query AND its DuckDB oracle on an ad-hoc
    documents corpus and return the parity problems list."""
    import duckdb

    from tools.parity import compare

    docs = spark.createDataFrame(
        docs_rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / f"corpus_{name}_{len(docs_rows)}")
    docs.coalesce(1).write.parquet(d + "/documents.parquet")
    sdf = E.queries()[name](spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    return compare(name, sdf, con.execute(E.oracle_sql()[name]).df())


def test_quality_deciles_null_chars_keep_oracle_parity(spark, tmp_path):
    """ADVICE r6: the doc→value-table join must be NULL-SAFE — rows
    with NULL n_chars form their own trailing tie group in BOTH
    engines (Spark desc ⇒ NULLS LAST; DuckDB DESC default ⇒ NULLS
    LAST), never silently drop. N=23 with 6 NULL docs puts NULLs
    across the last three tiles; the approx variant must also agree
    (NULL lands in decile 10 via the filter-drops-NULL-comparison
    convention, identical in both engines)."""
    rows = [(i, "x" * (1 + (i * 7) % 5), "en", "s", 1 + (i * 7) % 5) for i in range(17)]
    rows += [(100 + i, "", "en", "s", None) for i in range(6)]
    for name in ("quality_deciles", "quality_deciles_approx"):
        problems = _decile_oracle_compare(spark, tmp_path, name, rows)
        assert not problems, f"{name}: {problems}"


def test_quality_deciles_approx_tie_convention_matches_duckdb(spark, tmp_path):
    """ADVICE r6: the oracle parity of quality_deciles_approx rests on
    Spark percentile_approx(accuracy=1e6) picking the same cut values
    as DuckDB quantile_disc. Pin the coincidence on the adversarial
    shapes where rank conventions could diverge: N % 10 != 0, heavy
    ties (2 distinct values), all-equal values, and a skewed 90/10
    split — full query-vs-oracle compare on each corpus."""
    shapes = {
        "awkward_n": [1 + (i * 13) % 7 for i in range(97)],
        "heavy_ties": [5 if i % 3 else 7 for i in range(103)],
        "all_equal": [4] * 41,
        "skew_90_10": [2] * 70 + [9] * 7,
    }
    for label, vals in shapes.items():
        rows = [(i, "x" * v, "en", label, v) for i, v in enumerate(vals)]
        problems = _decile_oracle_compare(spark, tmp_path, "quality_deciles_approx", rows)
        assert not problems, f"{label}: {problems}"


def test_ann_footholds_are_narrow_scans(spark, sf_dir):
    """The candidate-generation footholds (r7) must keep the parent
    probes' scale shape: the corpus streams through ONE narrow
    mapInPandas (band tagging / cell argmax against a broadcast
    constant) with NO corpus hash-shuffle and NO join — the only
    exchange is the presentation orderBy's range partitioning."""
    for name in ("ann_lsh_bands", "ann_ivf_cell_assign",
                 "dedup_embedding_band_keys"):
        plan = plan_of(spark, sf_dir, name, mode="simple")
        assert "hashpartitioning" not in plan, name
        assert "Join" not in plan, name
        assert "MapInPandas" in plan, name


def test_lsh_plane_literals_roundtrip_duckdb_bit_exact():
    """ADVICE r7: bare decimal literals parse as DECIMAL(19,18) in
    DuckDB, drifting 46/512 plane constants by 1 ulp (and CAST of a
    bare literal still parses DECIMAL first). The '<repr>'::DOUBLE
    string form in _dd_planes_cte is a float64 parse — pin that EVERY
    plane constant round-trips bit-exactly through the oracle CTE."""
    import duckdb

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.functions import vectors as V
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.similarity import _DIM, _N_PLANES, _dd_planes_cte

    planes = V.np_planes(dim=_DIM, n_planes=_N_PLANES).tolist()
    got = dict(duckdb.sql(_dd_planes_cte() + " ORDER BY p").fetchall())
    assert len(got) == _N_PLANES
    for p, row in enumerate(planes):
        assert got[p] == row, f"plane {p} drifted through DuckDB literal parse"


def test_ivf_centroid_formula_shared_between_parent_and_foothold():
    """ADVICE r7: ann_ivf_topk and ann_ivf_cell_assign must derive
    centroids from ONE helper so the foothold pins the parent's actual
    cell assignment. Pin by source inspection: both bodies call
    _ivf_coarse_centroids and neither re-implements the clamp."""
    import inspect

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans import similarity as S

    for fn in (S.ann_ivf_topk, S.ann_ivf_cell_assign):
        src = inspect.getsource(fn)
        assert "_ivf_coarse_centroids(" in src, fn.__name__
        assert "isqrt" not in src, f"{fn.__name__} re-implements the stride clamp"


def test_drift_ks_binned_shuffle_is_dimension_sized(spark, sf_dir):
    """The 100-TB KS degrade (round 8): the per-type extent aggregate
    BROADCASTS back onto the event scan (the big side never shuffles
    for the join) and the (type, bin) rollup partial-combines — so
    shuffle rows are capped at |types| × bins per task. The exact KS's
    distinct-(type, value) support shuffle must not exist here."""
    plan = plan_of(spark, sf_dir, "drift_ks_binned", mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    # exactly one data-shuffle key shape: the (type, bin) rollup; the
    # cumulative windows repartition the dimension-sized rollup only
    assert "Exchange hashpartitioning(event_type#" in plan


def test_quality_deciles_has_no_corpus_sized_single_partition_window(spark, sf_dir):
    """The round-6 rewrite's only unpartitioned window runs over the
    groupBy(n_chars) VALUE table (dimension-sized); the corpus-sized
    work is the hashpartitioning(n_chars) window + a broadcast join of
    the cut table back onto docs."""
    plan = plan_of(spark, sf_dir, "quality_deciles", mode="simple")
    assert "partial_count" in plan  # value table is map-side combined
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(n_chars" in plan


def test_quality_deciles_approx_is_one_pass_no_window(spark, sf_dir):
    """The approx companion must contain NO window operator at all and
    partial-combine the quantile sketch map-side — the one-aggregate +
    broadcast shape that makes it the 100-TB mixture-sampling mode."""
    plan = plan_of(spark, sf_dir, "quality_deciles_approx", mode="simple")
    assert "Window" not in plan
    assert "partial_percentile_approx" in plan
    assert "Broadcast" in plan


def test_time_weighted_avg_partial_aggregates(spark, sf_dir):
    """The weighted sums must partial-combine map-side after the single
    LEAD window — fact-scale rows shrink to user-sized output before
    any further exchange."""
    plan = plan_of(spark, sf_dir, "time_weighted_avg", mode="simple")
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_cosine_pairs_joins_pinned_postings(spark, sf_dir):
    """The posting self-join must read the localCheckpoint-pinned
    postings (ExistingRDD) on both sides — never re-running the
    tokenize→tf→df pipeline — and the final ranking must be a
    TakeOrdered over the bounded pair table."""
    plan = plan_of(spark, sf_dir, "tfidf_cosine_pairs", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "ExistingRDD" in plan
    # the only corpus scans happen before the checkpoint; the final
    # plan must not re-scan documents
    assert "documents.parquet" not in plan


def test_gini_label_balance_is_joinless_and_partial(spark, sf_dir):
    """Everything after the label-count scan is |classes|-sized: no
    join; the count partial-combines map-side; the singleton aggregate
    rides a SinglePartition exchange of the tiny count table."""
    plan = plan_of(spark, sf_dir, "gini_label_balance", mode="simple")
    assert "Join" not in plan
    assert "partial_count" in plan
    assert "SinglePartition" in plan


def test_burst_detection_rolls_up_before_stats(spark, sf_dir):
    """The event scan must shrink to the (type, hour) rollup FIRST
    (partial-agg'd), with mean/stddev as windows OVER the rollup —
    never a join back onto events."""
    plan = plan_of(spark, sf_dir, "burst_detection", mode="simple")
    assert "Join" not in plan
    assert "partial_count" in plan
    assert "stddev_samp" in plan


def test_vocab_growth_single_corpus_scan_per_side(spark, sf_dir):
    """All curve points must come from ONE conditional aggregate over
    the first-seen table (a single stack/Generate) — the corpus is
    scanned for tokens once plus once for the max-id scalar, never per
    curve point."""
    plan = plan_of(spark, sf_dir, "vocab_growth_curve", mode="simple")
    assert plan.count("Generate stack") == 1
    assert plan.count("FileScan") <= 2 + plan.count("ReusedExchange")


def test_user_overlap_pins_the_distinct(spark, sf_dir):
    """The (user, type) distinct must be localCheckpoint-pinned so the
    self-join sides and the size table read it (ExistingRDD) instead of
    re-running the corpus distinct; size joins broadcast."""
    plan = plan_of(spark, sf_dir, "user_overlap_jaccard", mode="simple")
    assert "ExistingRDD" in plan
    assert "FileScan" not in plan  # no corpus re-scan after the pin
    assert plan.count("BroadcastHashJoin") >= 2


def test_attribution_frame_is_add_only(spark, sf_dir):
    """Whale-key regression guard (round-4 skew probe): the carry-
    forward window must be an UNBOUNDED PRECEDING frame — Spark
    re-evaluates bounded moving frames per slide (no retraction), which
    is O(events × frame-rows) on a single hot key; the bounded 7-day
    form measured as did-not-finish on the whale corpus."""
    plan = plan_of(spark, sf_dir, "attribution_last_touch", mode="simple")
    assert "unboundedpreceding" in plan
    assert "-604800000000" not in plan  # the old bounded frame spec


def test_copurchase_is_join_free_single_collect(spark, sf_dir):
    """Round-11 rewrite (VERDICT r10 #3, two iterations): the plan must
    contain NO join and NO pair-keyed global distinct — one groupBy on
    the order key (collect_set dedupes inside the basket) feeding a
    codegen'd Generate. This is the shape that fits the 8 g heap at the
    1000× probe where both join-ful predecessors OOM'd."""
    plan = plan_of(spark, sf_dir, "copurchase_pairs")
    assert "Join" not in plan
    assert "Generate" in plan  # the explode of the pair expansion
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_cross_snapshot_fuzzy_is_join_free(spark, sf_dir):
    """Round-11 rewrite (VERDICT r10 #4): the lsh_candidate_pairs
    bucket shape — no membership join; the new-vs-old split happens
    inside each bucket with array ops."""
    plan = plan_of(spark, sf_dir, "dedup_cross_snapshot_fuzzy")
    assert "Join" not in plan


def test_snapshot_novelty_join_is_gram_keyed_merge(spark, sf_dir):
    """Both join sides scale with the corpus (new-doc grams ⋈ old
    distinct grams) — the merge pin must hold so size estimates can
    never pick a broadcast that 100 TB invalidates."""
    plan = plan_of(spark, sf_dir, "snapshot_novelty")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_scrub_is_single_scan_partial_agg(spark, sf_dir):
    """One codegen scan + a |sources|-key partial agg: no join, no
    Python, and the shuffle count is structural (ADVICE r11: count
    Exchange nodes from the analyzed physical-plan tree, not
    'Exchange (' substrings of the pretty-printed explain, whose
    spelling is Spark-version- and AQE-formatting-sensitive)."""
    plan = plan_of(spark, sf_dir, "pii_scrub_counts")
    assert "Join" not in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one agg exchange + the deterministic-output orderBy's range
    # exchange over the 20-row result — nothing corpus-sized
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry

    df = registry.all_queries()["pii_scrub_counts"](spark, sf_dir)
    jplan = df._jdf.queryExecution().executedPlan()

    def count_exchanges(node) -> int:
        # AdaptiveSparkPlanExec is a LEAF node (zero children) wrapping
        # the real tree — descend through initialPlan() or the counter
        # is vacuously 0 under AQE (round-12 code-review find)
        if node.nodeName().startswith("AdaptiveSparkPlan"):
            return count_exchanges(node.initialPlan())
        n = 1 if node.nodeName().startswith("Exchange") else 0
        children = node.children()
        for i in range(children.size()):
            n += count_exchanges(children.apply(i))
        return n

    found = count_exchanges(jplan)
    # lower bound guards the counter itself against going vacuous: the
    # agg exchange must always be visible
    assert 1 <= found <= 2, found


def test_hll_register_build_is_bounded_shuffle(spark, sf_dir):
    """The sketch path's shuffles are register-bounded ((type, j) then
    type-keyed Z); the only corpus-keyed exchange is the exact-count
    witness column's COUNT(DISTINCT), which production drops. Assert
    the register build stays codegen (conv/bin inside the scan, no
    Python) and the final join broadcasts the ≤|types|+1-row exact
    side."""
    plan = plan_of(spark, sf_dir, "hll_user_reach")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # est ⋈ exact on event_type
