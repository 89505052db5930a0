"""Chunked line-text source — the reference's O1 (hw4.cc:61-80).

The reference concatenates every ``chunk_size`` lines into one chunk
string on every MPI rank (redundantly — quirk Q6). Here the file is read
once, distributed, and chunk assembly is a DataFrame aggregation; quirk
Q2 (delimiter-less concatenation, hw4.cc:72) is an explicit flag.

At scale you would not chunk by line count at all — Spark's file splits
(``spark.sql.files.maxPartitionBytes``) do this job natively (SURVEY.md
§1.4); this source exists for faithful-mode parity, where chunk ids are
load-bearing (the locality table and task count key off them, Q7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chunked_lines(
    spark: SparkSession,
    path: str,
    chunk_size: int,
    fuse_chunk_lines: bool = False,
) -> DataFrame:
    """Return (chunk_id, chunk) with 1-based chunk ids, ``chunk_size``
    lines per chunk.

    ``fuse_chunk_lines=True`` reproduces Q2: lines concatenated with no
    separator, so the last word of line k fuses with the first word of
    line k+1 unless lines end with a space. Default inserts a single
    space (the fix).

    Line numbering must be the file's order: ``zipWithIndex`` over the
    text RDD gives a deterministic global index without collecting
    anything to the driver (one extra job to count per-partition sizes —
    the standard price for global ordinals on a distributed file).
    """
    sep = "" if fuse_chunk_lines else " "
    lines = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .map(lambda t: (t[1], t[0]))
        .toDF(["idx", "value"])
    )
    return (
        lines.withColumn("chunk_id", (F.col("idx") / chunk_size).cast("long") + 1)
        .groupBy("chunk_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "value"))),
                    lambda s: s["value"],
                ),
            ).alias("chunk")
        )
    )


def read_locality_table(path: str) -> dict[int, int]:
    """Parse the ``chunk_id node_id`` locality config (hw4.cc:87-96).

    Driver-side (the file is tiny — one line per map task). The
    reference folds node ids onto live ranks with ``node_id % (node-1)
    + 1``; that fold depends on the MPI world size, so it's applied by
    the caller that knows its worker count. Spark schedules with its own
    locality machinery (SURVEY.md §2.1 O2/O12 — nothing to build), so
    this table's only load-bearing role in faithful mode is Q7: the
    number of map tasks equals the number of entries.
    """
    table: dict[int, int] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                table[int(parts[0])] = int(parts[1])
    return table
