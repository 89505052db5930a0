"""Deduplication operators over ``documents`` / ``embeddings``.

The north-star dedup family (SURVEY.md §2.2, BASELINE.json): exact
(hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
near-dup. Each is a real distributed plan — signatures are computed
scan-side with zero shuffle (higher-order functions over token arrays),
and only the candidate-generation join shuffles, on the banding/shingle
key. MinHash/SimHash use md5 as the hash family so the DuckDB oracle can
replicate signatures bit-for-bit (md5 agrees across engines; so does
lexicographic min over lowercase-hex strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import text as X
from ..functions import vectors as V
from ..registry import query

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
    FROM documents GROUP BY 1 ORDER BY fp
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint, keep
    the lowest doc_id per cluster. One shuffle on the 128-bit key — at
    100 TB this is the cheapest possible dedup (partial-agg'd, no row
    payloads cross the wire, only (fp, min_id, cnt) triples)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", X.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_cnt"))
        .orderBy("fp")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_NUM_HASHES = 8
_BANDS = 4
_ROWS_PER_BAND = _NUM_HASHES // _BANDS  # r=2, b=4 → s-curve threshold ≈ 0.5

_DD_SHINGLES = r"""
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(l) - 2, 0) + 1),
               i -> array_to_string(l[i:i+2], ' '))) AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
            FROM documents)
"""


def _dd_minhash_sig() -> list[str]:
    """DuckDB expressions for the K minhash values (min over md5(shingle||':j'))."""
    return [
        f"list_min(list_transform(shingles, s -> md5(s || ':{j}')))"
        for j in range(_NUM_HASHES)
    ]


def _minhash_j(shingles: F.Column, j: int) -> F.Column:
    # NB: the transform lambda must take exactly one arg — a second arg
    # would be interpreted by PySpark as the element *index* column.
    suffix = F.lit(f":{j}")
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(s, suffix))))


def minhash_signature(shingles: F.Column) -> F.Column:
    """K-element minhash signature computed entirely scan-side: per hash
    seed j, min over md5(shingle ++ ':j'). No shuffle, no UDF — the
    signature of a 10 kB document costs K·|shingles| md5 calls inside
    whole-stage codegen."""
    return F.array(*[_minhash_j(shingles, j) for j in range(_NUM_HASHES)])


def _with_signatures(docs: DataFrame) -> DataFrame:
    shingles = X.word_shingles("text", 3)
    return (
        docs.select("doc_id", minhash_signature(shingles).alias("sig"), F.size(shingles).alias("n_sh"))
        .filter(F.col("n_sh") > 0)
    )


@query(
    "dedup_minhash_sig",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES})
    SELECT doc_id, {", ".join(f"{e} AS mh{j}" for j, e in enumerate(_dd_minhash_sig()))}
    FROM sh WHERE len(shingles) > 0 ORDER BY doc_id
    """,
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (K=8) as columns — the oracle checks every
    signature value bit-for-bit."""
    sigs = _with_signatures(table(spark, sf_dir, "documents"))
    cols = [F.col("sig")[j].alias(f"mh{j}") for j in range(_NUM_HASHES)]
    return sigs.select("doc_id", *cols).orderBy("doc_id")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    sig AS (
      SELECT doc_id, {", ".join(f"{e} AS mh{j}" for j, e in enumerate(_dd_minhash_sig()))}
      FROM sh WHERE len(shingles) > 0
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(mh{2*b} || '|' || mh{2*b+1}) AS band_key FROM sig"
        for b in range(_BANDS)
      )}
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ORDER BY a_id, b_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: band the K=8 signature into b=4 bands
    of r=2, bucket-join on (band_id, band_key). The join key is a 128-bit
    hash → near-uniform partitioning; candidate volume scales with true
    near-dup density, not |docs|² — the property that makes this the
    100 TB fuzzy-dedup plan of record."""
    sigs = _with_signatures(table(spark, sf_dir, "documents"))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws("|", *[F.col("sig")[2 * b + i] for i in range(_ROWS_PER_BAND)])
                        ).alias("band_key"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32

# Shared SQL fragment (valid in BOTH Spark SQL and DuckDB): ±1 contribution
# of token t at bit j = parity of the j-th hex nibble of md5(t).
def _bit_contrib(j: int, tok: str = "t") -> str:
    return (
        f"(CASE WHEN (instr('0123456789abcdef', substr(md5({tok}), {j + 1}, 1)) - 1) % 2 = 1"
        f" THEN 1 ELSE -1 END)"
    )


@query(
    "dedup_simhash",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
      FROM documents
    )
    SELECT doc_id,
           {" || ".join(
             f"(CASE WHEN list_sum(list_transform(l, t -> {_bit_contrib(j)})) >= 0 THEN '1' ELSE '0' END)"
             for j in range(_SIMHASH_BITS)
           )} AS simhash
    FROM toks WHERE len(l) > 0 ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit — one bit per md5 hex nibble, parity family): per bit j, sum ±1 over all
    tokens by the parity of md5(token)'s j-th nibble; the sign is the
    signature bit. Scan-side only (aggregate over the token array inside
    codegen) — zero shuffle; near-dup pairs then join on signature bands
    exactly like MinHash-LSH."""
    docs = table(spark, sf_dir, "documents")
    toks = X.tokens("text", r"\s+")
    # per-bit aggregates share the _bit_contrib SQL fragment with the oracle
    toks_sql = r"filter(split(text, '\\s+'), t -> t != '')"
    cols = [
        F.expr(
            f"CASE WHEN aggregate({toks_sql}, 0, (acc, t) -> acc + {_bit_contrib(j)}) >= 0"
            f" THEN '1' ELSE '0' END"
        ).alias(f"b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    return (
        docs.select("doc_id", F.concat(*cols).alias("simhash"), F.size(toks).alias("n"))
        .filter(F.col("n") > 0)
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    )


@query("dedup_simhash_pairs")  # rows-only: pair search over hamming distance
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 16 bits into 4 bands of 4; docs
    sharing any band are candidates; keep pairs with Hamming distance ≤ 4.
    Rows-only check (the banding join is Spark-specific plumbing; the
    signature itself is oracle-verified by dedup_simhash)."""
    sig = dedup_simhash(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.substring("simhash", 4 * b + 1, 4).alias("band_key"))
                for b in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.aggregate(
        F.zip_with(
            F.split(F.col("a.simhash"), ""),
            F.split(F.col("b.simhash"), ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
        .distinct()
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard
# ---------------------------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_DD_SHINGLES}),
    ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
    cnt AS (SELECT doc_id, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, round(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = a_id
    JOIN cnt cb ON cb.doc_id = b_id
    WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.05
    ORDER BY a_id, b_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index join: explode distinct
    3-shingles, self-join on shingle (only docs sharing a shingle meet —
    candidate volume is data-dependent, never |docs|²), count common,
    Jaccard from per-doc shingle counts. Hot shingles are the skew risk
    at scale → AQE skew-join handles it (enabled in session.py)."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", X.word_shingles("text", 3).alias("shingles"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    cnt = sh.filter(F.size("shingles") > 0).select(
        "doc_id", F.size("shingles").alias("n")
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("common"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    jac = F.col("common") * 1.0 / (F.col("ca.n") + F.col("cb.n") - F.col("common"))
    return (
        pairs.join(ca, F.col("ca.doc_id") == F.col("a_id"))
        .join(cb, F.col("cb.doc_id") == F.col("b_id"))
        .filter(jac >= 0.05)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {V.dd_cosine('a.embedding', 'b.embedding')} >= 0.4
    ORDER BY a_id, b_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ 0.4 (threshold sits
    ≥1e-4 from every pair in the fixtures, far above double noise). Brute-force O(n²)
    here (correctness baseline); the scale path is the LSH-bucketed
    variant in plans.similarity (bucket first, compare within buckets).
    (At scale, pre-normalize once so the pair predicate is a plain dot
    product; kept as dot/(‖a‖·‖b‖) here so the arithmetic order matches
    the oracle exactly.)"""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a, b = emb.alias("a"), emb.alias("b")
    cos = V.cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= 0.4)
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
        .orderBy("a_id", "b_id")
    )
