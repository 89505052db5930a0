"""Table-maintenance operators on planted fixtures: CDC diff, SCD-2
history, compaction planning, expectations audit, paragraph dedup."""

import datetime

import pytest

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
    compaction_bins,
    data_expectations,
    scd2_history,
    snapshot_diff,
)

_W = "w%d"


def _chunk(tag: str) -> str:
    """A distinct 12-token chunk: 'tag0 tag1 ... tag11'."""
    return " ".join(f"{tag}{i}" for i in range(12))


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """documents-shaped table exercising every snapshot_diff class:
    0 (removed AND %19 re-added), 13 (changed), 17 (removed),
    19 (unchanged but %19 re-added), 1 (unchanged)."""
    rows = [
        (0, "alpha beta", "en", "s", 10),
        (1, "gamma delta", "en", "s", 11),
        (13, "epsilon zeta", "en", "s", 12),
        (17, "eta theta", "en", "s", 9),
        (19, "iota kappa", "en", "s", 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("cdc"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_snapshot_diff_classifies_all_ops(spark, docs_dir):
    got = {r["doc_id"]: r["op"] for r in snapshot_diff(spark, docs_dir).collect()}
    assert got == {
        0: "removed",  # % 17 == 0 → dropped in v2
        13: "changed",  # % 13 == 0 → text updated
        17: "removed",
        1000000: "added",  # doc 0 re-added under +1e6 (% 19 == 0)
        1000019: "added",
    }
    # unchanged docs (1, 19-as-itself) do not appear at all
    assert 1 not in got and 19 not in got


def test_scd2_collapses_consecutive_duplicates(spark, tmp_path_factory):
    t = lambda m: datetime.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 7: A A B A → three versions (middle A run collapses)
        (1, t(0), 7, "A", 1.0, "{}"),
        (2, t(1), 7, "A", 1.0, "{}"),
        (3, t(2), 7, "B", 1.0, "{}"),
        (4, t(3), 7, "A", 1.0, "{}"),
        # user 8: single state → one current row
        (5, t(5), 8, "C", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path_factory.mktemp("scd2"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = scd2_history(spark, d).collect()
    u7 = [(r["state"], r["valid_from"].minute, r["valid_to"] and r["valid_to"].minute, r["is_current"]) for r in out if r["user_id"] == 7]
    assert u7 == [("A", 0, 2, False), ("B", 2, 3, False), ("A", 3, None, True)]
    u8 = [(r["state"], r["is_current"]) for r in out if r["user_id"] == 8]
    assert u8 == [("C", True)]


def test_compaction_bins_greedy_packing(spark, tmp_path_factory):
    rows = [  # one source, sizes 3000/3000/3000 at target 4000
        (0, "x", "en", "s", 3000),
        (1, "y", "en", "s", 3000),
        (2, "z", "en", "s", 3000),
        (3, "q", "en", "other", 100),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("compact"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = {(r["source"], r["bin"]): r for r in compaction_bins(spark, d).collect()}
    # files 0,1 pack into bin 0 (prior 0, 3000); file 2 (prior 6000) → bin 1
    assert out[("s", 0)]["n_files"] == 2 and out[("s", 0)]["bin_bytes"] == 6000
    assert out[("s", 1)]["n_files"] == 1
    assert out[("s", 0)]["first_doc"] == 0 and out[("s", 0)]["last_doc"] == 1
    assert out[("other", 0)]["n_files"] == 1


def test_data_expectations_names_and_verdicts(spark, sf_dir):
    out = {r["constraint_name"]: r for r in data_expectations(spark, sf_dir).collect()}
    assert len(out) == 8
    # the round-4 finite-value gate: fixture values are all finite
    assert out["events_value_finite"]["violations"] == 0
    assert out["events_value_finite"]["passed"] is True
    # fixture invariants: orders PK is unique, FK closed, but docs DO
    # exceed 500 chars — the audit must show both pass and fail rows
    assert out["orders_pk_unique"]["violations"] == 0
    assert out["orders_pk_unique"]["passed"] is True
    assert out["orders_fk_customer"]["violations"] == 0
    assert out["documents_nchars_le_500"]["violations"] > 0
    assert out["documents_nchars_le_500"]["passed"] is False


def test_paragraph_dedup_removes_repeated_chunks(spark, tmp_path_factory):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.dedup import (
        paragraph_dedup,
    )

    a, b, c = _chunk("a"), _chunk("b"), _chunk("c")
    rows = [
        (0, f"{a} {b}", "en", "s", 100),  # first occurrence of a, b
        (1, f"{b} {c}", "en", "s", 100),  # b is boilerplate → removed
        (2, a, "en", "s", 100),  # whole doc already seen → emptied
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path_factory.mktemp("para"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r for r in paragraph_dedup(spark, d).collect()}
    assert out[0]["clean_text"] == f"{a} {b}" and out[0]["n_removed"] == 0
    assert out[1]["clean_text"] == c and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 1


def test_table_profile_fixture_invariants(spark, sf_dir):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        table_profile,
    )

    out = {r["column_name"]: r for r in table_profile(spark, sf_dir).collect()}
    assert set(out) == {"l_linenumber", "l_linestatus", "l_returnflag", "l_shipdate"}
    assert out["l_returnflag"]["n_distinct"] == 3  # A / N / R
    assert out["l_linestatus"]["n_distinct"] == 2  # O / F
    for r in out.values():
        assert r["null_count"] == 0 and r["top_count"] > 0


def test_k_anonymity_suppresses_small_groups(spark, tmp_path_factory):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        k_anonymity_suppress,
    )

    rows = [(i, f"c{i}", 1, 100.0, "SEG_A") for i in range(6)]  # big group
    rows += [(10, "c10", 2, 50.0, "SEG_B")]  # singleton → suppressed
    df = spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    d = str(tmp_path_factory.mktemp("kanon"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/customer.parquet")

    out = {(r["c_nationkey"], r["c_mktsegment"]): r
           for r in k_anonymity_suppress(spark, d).collect()}
    big, small = out[(1, "SEG_A")], out[(2, "SEG_B")]
    assert not big["suppressed"] and big["acctbal_sum"] == 600.0
    assert small["suppressed"] and small["acctbal_sum"] is None
    assert small["group_size"] == 1  # size stays visible for the audit


def test_merge_upsert_applies_all_ops(spark, tmp_path_factory):
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        merge_upsert,
    )

    rows = [(1, "a", 0, 10.0, "S"), (7, "b", 0, 20.0, "S"),
            (10, "c", 0, 30.0, "S"), (13, "d", 0, 40.0, "S")]
    df = spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    d = str(tmp_path_factory.mktemp("merge"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/customer.parquet")

    out = {r["c_custkey"]: r["c_acctbal"] for r in merge_upsert(spark, d).collect()}
    assert out == {
        1: 10.0,        # untouched passthrough
        10: 130.0,      # % 10 → updated
        13: 40.0,       # source of an insert, itself unchanged
        1000013: 40.0,  # % 13 → inserted under new key
    }  # 7 deleted


def test_pit_state_matches_scd2_intervals(spark, sf_dir):
    """Cross-operator contract: for a sample of events, the PIT state
    equals the SCD-2 version whose [valid_from, valid_to) contains the
    event timestamp."""
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import table
    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        pit_state_at_event,
        scd2_history,
    )

    hist = scd2_history(spark, sf_dir).collect()
    pit = {r["event_id"]: r for r in pit_state_at_event(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events").orderBy("event_id").limit(50).collect()
    for e in ev:
        expect = [
            h["state"]
            for h in hist
            if h["user_id"] == e["user_id"]
            and h["valid_from"] <= e["ts"]
            and (h["valid_to"] is None or e["ts"] < h["valid_to"])
        ]
        assert len(expect) == 1
        assert pit[e["event_id"]]["state"] == expect[0]


def test_referential_integrity_audit_counts_planted_orphans(spark, tmp_path_factory):
    """Planted orphans: two lineitems pointing at a missing order and
    one order at a missing customer must be counted; NULL FKs are not
    orphans by contract."""
    import datetime

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.maintenance import (
        referential_integrity_audit,
    )

    d = str(tmp_path_factory.mktemp("ri"))
    t0 = datetime.datetime(2026, 1, 1)

    def w(name, df):
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")

    w("region", spark.createDataFrame([(0, "r")], ["r_regionkey", "r_name"]))
    w("nation", spark.createDataFrame([(0, "n", 0)], ["n_nationkey", "n_name", "n_regionkey"]))
    w("customer", spark.createDataFrame([(1, "c", 0)], ["c_custkey", "c_name", "c_nationkey"]))
    w("supplier", spark.createDataFrame([(1, "s", 0)], ["s_suppkey", "s_name", "s_nationkey"]))
    w("orders", spark.createDataFrame(
        [(10, 1, "O", 1.0, t0, "p"), (11, 999, "O", 1.0, t0, "p"),
         (12, None, "O", 1.0, t0, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"))
    w("lineitem", spark.createDataFrame(
        [(10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
         (777, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
         (888, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"))
    out = {r["relationship"]: r["orphans"]
           for r in referential_integrity_audit(spark, d).collect()}
    assert out["lineitem.l_orderkey -> orders"] == 2
    assert out["orders.o_custkey -> customer"] == 1  # NULL FK not counted
    assert out["customer.c_nationkey -> nation"] == 0
