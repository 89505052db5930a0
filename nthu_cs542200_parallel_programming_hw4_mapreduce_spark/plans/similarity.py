"""Similarity search over the ``embeddings`` table (north star:
approximate-nearest-neighbor over an ``array<float>`` column).

Two tiers (SURVEY.md §2.2 "similarity search"):

* brute-force cosine top-k — the exactness baseline, DuckDB-oracled;
* LSH-bucketed ANN (random-hyperplane signs) — the scale path: candidates
  only meet within a bucket, so compare volume scales with bucket size,
  not |corpus|·|queries|.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import vectors as V
from ..registry import query

_K = 3
_N_QUERIES = 5  # vec_id < 5 are the query vectors


@query(
    "cosine_knn_exact",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.q_id, c.vec_id AS n_id,
             round({V.dd_cosine('q.qe', 'c.embedding')}, 5) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id
               ORDER BY {V.dd_cosine('q.qe', 'c.embedding')} DESC, c.vec_id
             ) AS rn
      FROM q JOIN embeddings c ON c.vec_id <> q.q_id
    )
    SELECT q_id, n_id, cos FROM scored WHERE rn <= {_K} ORDER BY q_id, n_id
    """,
)
def cosine_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) query set against
    the corpus scan, score every pair, keep k per query. At 100 TB the
    corpus side streams through executors once; only |queries|·k rows
    survive to the final (cheap) shuffle. Tie-break on n_id keeps the
    winner deterministic across engines and partitionings."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cos = V.cosine(F.col("qe"), F.col("c.embedding"))
    scored = (
        emb.alias("c")
        .crossJoin(F.broadcast(q))
        .filter(F.col("c.vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("c.vec_id").alias("n_id"),
            F.round(cos, 5).alias("cos"),
            cos.alias("_raw"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_raw").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("q_id", "n_id", "cos")
        .orderBy("q_id", "n_id")
    )


# --- LSH ANN ---------------------------------------------------------------

_N_PLANES = 8
_DIM = 64


def _planes(dim: int = _DIM, n_planes: int = _N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG, so every
    run (and every executor) derives identical planes; shipped to tasks as
    a literal array (tiny), the broadcast-variable pattern for constants."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{p}:{i}".encode()).hexdigest()
            row.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(emb_col: str | F.Column, dim: int = _DIM) -> F.Column:
    """Random-hyperplane signature: one sign bit per plane, concatenated
    into the bucket key. Pure column expressions — evaluated scan-side.
    ``dim`` must match the embedding width (planes are derived per-dim,
    deterministically)."""
    c = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    bits = []
    for row in _planes(dim=dim):
        plane = F.array(*[F.lit(w) for w in row])
        d = F.aggregate(
            F.zip_with(c, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


@query("ann_lsh_topk")  # rows-only: bucketing strategy is engine-specific
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: queries only meet corpus
    vectors sharing their 8-bit bucket (~1/256 of the corpus per probe).
    Scale path for similarity search — the shuffle key is the bucket, and
    bucket sizes are balanced by construction for centered data. Recall
    is approximate (hence rows-only; the exact baseline is
    cosine_knn_exact)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", lsh_bucket("embedding").alias("bucket")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cos = V.cosine(F.col("qe"), F.col("c.embedding"))
    scored = (
        emb.alias("c")
        .join(F.broadcast(q), F.col("c.bucket") == F.col("qbucket"))
        .filter(F.col("c.vec_id") != F.col("q_id"))
        .select("q_id", F.col("c.vec_id").alias("n_id"), F.round(cos, 5).alias("cos"), cos.alias("_raw"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("_raw").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("q_id", "n_id", "cos")
        .orderBy("q_id", "n_id")
    )


@query("ann_ivf_topk")  # rows-only: centroid assignment is engine-specific
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN with the classic √n balance: ~√n cells (clamped to
    [16, 4096]), so assignment is n·√n BLAS FLOPs and each probe scans
    ~√n candidates — both sublinear in compare volume per vector. (The
    first cut used every-50th-vector centroids: cell COUNT grew linearly
    with the corpus, making assignment quadratic — cell count must be
    sublinear in n or IVF degenerates below brute force.)

    Centroids are a deterministic stride sample (k-means-free for
    reproducibility); the centroid matrix is ≤4096×d floats — bounded by
    construction, so collecting it into a broadcast variable is O(1) in
    corpus size. Assignment runs as a narrow ``mapInPandas`` (one numpy
    argmax per Arrow batch): no join, no window shuffle — the corpus
    streams through once and leaves with a cell id appended. The only
    corpus-sized shuffle left is the per-cell candidate join, volume
    |probes|·√n."""
    import math

    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = min(4096, max(16, math.isqrt(n)))
    stride = max(1, n // k_cells)
    cents = emb.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    cent_rows = cents.collect()  # bounded: ≤4096 × d floats
    cent_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    cmat = np.stack([np.asarray(r["ce"], dtype=np.float64) for r in cent_rows])
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cent_ids, cmat))

    def assign(batches):
        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            best = np.argmax(x @ mat.T, axis=1)
            pdf = pdf.assign(cell=ids[best])
            yield pdf[["vec_id", "embedding", "cell"]]

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<double>, cell long"
    )
    # queries probe their 2 best cells (tiny: |q| × k_cells rows)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    cos_qc = V.cosine(F.col("qe"), F.col("ce"))
    w_probe = Window.partitionBy("q_id").orderBy(F.col("_d").desc(), F.col("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("q_id", "qe", "cent_id", cos_qc.alias("_d"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("q_id", "qe", F.col("cent_id").alias("cell"))
    )
    cos_qn = V.cosine(F.col("qe"), F.col("c.embedding"))
    scored = (
        assigned.alias("c")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("c.vec_id") != F.col("q_id"))
        .select("q_id", F.col("c.vec_id").alias("n_id"), F.round(cos_qn, 5).alias("cos"), cos_qn.alias("_raw"))
    )
    w_top = Window.partitionBy("q_id").orderBy(F.col("_raw").desc(), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _K)
        .select("q_id", "n_id", "cos")
        .orderBy("q_id", "n_id")
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label, dim, round(avg(v), 6) AS c
    FROM (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ) t
    GROUP BY label, dim
    ORDER BY label, dim
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the building block
    for k-means/IVF training. posexplode → groupBy(label, dim) AVG:
    map-side partial averages mean the shuffle carries |labels|·|dims|
    partials per task, independent of corpus size. avg of float32 values
    promoted to double; rounded(6) for cross-engine interpolation-free
    comparison (sum order still matters for the last ulp)."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    return (
        ex.groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("c"))
        .orderBy("label", "dim")
    )
