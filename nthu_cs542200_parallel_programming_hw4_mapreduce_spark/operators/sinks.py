"""Training-data sinks — deterministic shard writing for LLM pipelines.

The reference's only sink is O11's one-text-file-per-reducer contract
(hw4.cc:350-357); the modern training-pipeline analog is "write the
corpus as N parquet shards whose membership and internal order are
STABLE": dataloaders address shards by index, resume mid-epoch by
(shard, offset), and re-runs of the pipeline must reproduce byte-stable
shards or checkpoint resumption silently reads different data.

``write_training_shards`` provides that contract Spark-first:

* shard assignment is content-independent — ``xxhash64(key) % n``
  (``pmod``, so never negative) — stable under re-ingestion, input
  split order, and cluster size, exactly the train_split_hash
  reproducibility argument;
* each shard is ONE file, produced by ``repartition(n, shard)`` (hash
  exchange routes every row to its shard's task — the O5/O11 pid
  pattern) followed by a JVM-side ``sortWithinPartitions`` on
  (shard, order_key): spillable, no Python, no driver collect;
* file naming is ``shard-{i:05d}.parquet`` via a dynamic
  ``partitionBy("_shard")`` write + rename, the same
  write-then-contract step run_job uses for ``{job}-{r}.out``.

At 100 TB, n is sized so shards land near the DFS block/object sweet
spot (512 MB–1 GB); the single exchange is the unavoidable minimum for
a membership-stable shard contract, and sorting happens inside each
writer task (no global sort)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key: str,
    order_by: str | None = None,
) -> list[str]:
    """Write ``df`` as exactly ``n_shards`` parquet files with
    deterministic membership (``pmod(xxhash64(key), n)``) and
    deterministic in-file row order (ascending ``order_by``, default
    the key column). Returns the shard file paths in shard order."""
    order_col = order_by or key
    staged = os.path.join(out_dir, "_staged")
    shards = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int")
    )
    (
        shards.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", order_col)
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(staged)
    )
    paths: list[str] = []
    for i in range(n_shards):
        part_dir = os.path.join(staged, f"_shard={i}")
        final = os.path.join(out_dir, f"shard-{i:05d}.parquet")
        files = sorted(glob.glob(os.path.join(part_dir, "part-*.parquet")))
        if not files:
            # a shard with no rows still gets an addressable (empty) file
            empty = shards.filter(F.lit(False)).drop("_shard")
            empty.coalesce(1).write.mode("overwrite").parquet(part_dir + "_empty")
            files = sorted(
                glob.glob(os.path.join(part_dir + "_empty", "part-*.parquet"))
            )
        assert len(files) == 1, (
            f"shard {i}: expected exactly one file, got {len(files)} — "
            "the repartition-by-shard contract was not honored"
        )
        os.replace(files[0], final)
        paths.append(final)
    for leftover in glob.glob(os.path.join(staged, "*")) + [staged]:
        shutil.rmtree(leftover, ignore_errors=True)
    return paths


def compact_files(
    spark,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[str]:
    """EXECUTE a small-file compaction: pack ``in_dir``'s parquet files
    into ~``target_bytes`` output files (the OPTIMIZE half of
    ``compaction_bins``, which only PLANS the packing).

    The bin plan is pure manifest arithmetic — file sizes from the
    directory listing, greedy exclusive-prefix-sum binning in
    deterministic (filename) order, identical to the declared query's
    rule — so the driver never touches row data. Each bin then rewrites
    as ONE file via a per-bin read + coalesce(1): every bin is an
    independent job, so a production compactor runs bins concurrently
    and commits per bin (crash-safe incremental progress), and the
    read side prunes to exactly the bin's files. Returns the output
    paths in bin order.
    """
    files = sorted(
        (e.name, e.stat().st_size)
        for e in os.scandir(in_dir)
        if e.name.endswith(".parquet") and e.is_file()
    )
    bins: list[list[str]] = []
    acc = 0
    for name, size in files:
        bin_idx = acc // target_bytes  # exclusive prefix sum → greedy bin
        # a single input ≥ 2× target_bytes advances bin_idx by 2+ in one
        # step, so grow the bin list to size, not by one
        while bin_idx >= len(bins):
            bins.append([])
        bins[bin_idx].append(os.path.join(in_dir, name))
        acc += size
    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    for i, group in enumerate(bins):
        if not group:
            # an oversized file consumed this bin's byte range entirely
            # (bin id = floor(prefix/target) skips numbers, matching the
            # compaction_bins planner's sparse ids) — nothing to write
            continue
        staged = os.path.join(out_dir, f"_compact_staged_{i}")
        spark.read.parquet(*group).coalesce(1).write.mode("overwrite").parquet(staged)
        part = sorted(glob.glob(os.path.join(staged, "part-*.parquet")))
        assert len(part) == 1, f"bin {i}: coalesce(1) must yield one file"
        final = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        os.replace(part[0], final)
        shutil.rmtree(staged, ignore_errors=True)
        paths.append(final)
    return paths
