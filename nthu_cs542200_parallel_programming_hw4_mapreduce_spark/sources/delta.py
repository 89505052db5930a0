"""Jar-free Delta Lake read path (plus a minimal test/fixture writer).

The Delta protocol's READ side needs no connector jar: the transaction
log under ``_delta_log/`` is newline-delimited JSON (one action per
line) plus optional parquet checkpoints, and the data files are plain
parquet. This module reconstructs the active file set from the log and
hands it to Spark's native parquet scan — so pushdown, column pruning,
and whole-stage codegen all apply unchanged, and partition columns come
back as per-group literals that Catalyst constant-folds (filtering on a
partition column prunes whole union branches = real partition pruning).

Scope (documented, checked):

* protocol ``minReaderVersion == 1`` only — column mapping (v2) and
  deletion vectors (v3) change row visibility in ways a plain parquet
  scan cannot honor, so those tables raise instead of misreading.
* JSON commits and parquet checkpoints (``_last_checkpoint``) are both
  replayed; actions apply strictly in version order.
* The active-file list materializes on the driver — metadata-scale by
  design (1M files ≈ 100 MB), the same posture as delta-standalone and
  Spark's own file index.

``write_delta_commit0`` exists so tests and fixtures can materialize a
real on-disk Delta table (data parquet + commit JSON) without the jar;
it writes a single commit-0 table and makes no concurrent-writer or
append claims — the reference writer is the real connector.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"


class DeltaProtocolError(NotImplementedError):
    """Table requires reader features this jar-free path cannot honor."""


def _checkpoint_actions(log_dir: str) -> tuple[int, list[dict]]:
    """Return (checkpoint_version, actions) from ``_last_checkpoint``,
    or (-1, []) when the table has no checkpoint yet. Checkpoint parquet
    is read via pyarrow (one row per action, struct columns)."""
    last = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(last):
        return -1, []
    with open(last) as f:
        meta = json.load(f)
    version = int(meta["version"])
    parts = meta.get("parts")
    if parts:
        names = [
            f"{version:020d}.checkpoint.{p + 1:010d}.{int(parts):010d}.parquet"
            for p in range(int(parts))
        ]
    else:
        names = [f"{version:020d}.checkpoint.parquet"]
    import pyarrow.parquet as pq

    actions: list[dict] = []
    for name in names:
        for row in pq.read_table(os.path.join(log_dir, name)).to_pylist():
            actions.append({k: v for k, v in row.items() if v is not None})
    return version, actions


def _log_actions(path: str, version: int | None = None) -> list[dict]:
    """All actions for the table, checkpoint first then JSON commits
    after it, in version order. ``version`` caps the replay (time
    travel); it must not predate the checkpoint, whose actions are
    already compacted."""
    log_dir = os.path.join(path, _LOG_DIR)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {path}")
    ckpt_version, actions = _checkpoint_actions(log_dir)
    if version is not None and version < ckpt_version:
        raise DeltaProtocolError(
            f"version {version} predates the checkpoint ({ckpt_version}); "
            "pre-checkpoint commits are compacted away"
        )
    commits = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    for name in commits:
        v = int(name.split(".")[0])
        if v <= ckpt_version:
            continue
        if version is not None and v > version:
            break
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                line = line.strip()
                if line:
                    actions.append(json.loads(line))
    if not actions:
        raise FileNotFoundError(f"empty Delta log: {path}")
    return actions


def table_version(path: str) -> int:
    """Latest committed version (max numbered JSON commit)."""
    log_dir = os.path.join(os.path.abspath(path), _LOG_DIR)
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    ]
    if not versions:
        raise FileNotFoundError(f"empty Delta log: {path}")
    return max(versions)


def read_delta_via_log(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Reconstruct a snapshot of the table from its transaction log and
    scan it with Spark's native parquet reader (see module header for
    scope). ``version`` selects a historical snapshot (time travel):
    the log replays only commits ≤ version, so the active-file set is
    exactly that commit's — the Delta reader contract, no jar."""
    path = os.path.abspath(path)
    protocol = None
    metadata = None
    active: dict[str, dict] = {}
    for a in _log_actions(path, version):
        if "protocol" in a:
            protocol = a["protocol"]
        elif "metaData" in a:
            metadata = a["metaData"]
        elif "add" in a:
            active[a["add"]["path"]] = a["add"]
        elif "remove" in a:
            active.pop(a["remove"]["path"], None)
    if protocol is None or metadata is None:
        raise FileNotFoundError(f"Delta log missing protocol/metaData: {path}")
    if int(protocol.get("minReaderVersion", 1)) > 1:
        raise DeltaProtocolError(
            f"table needs minReaderVersion={protocol['minReaderVersion']} "
            "(column mapping / deletion vectors); this jar-free reader "
            "supports version 1 — use the delta-spark connector instead"
        )

    schema_str = metadata["schemaString"]
    schema = T.StructType.fromJson(
        json.loads(schema_str) if isinstance(schema_str, str) else schema_str
    )
    part_cols = list(metadata.get("partitionColumns") or [])
    file_schema = T.StructType([f for f in schema.fields if f.name not in part_cols])
    part_fields = {f.name: f for f in schema.fields if f.name in part_cols}

    def abs_file(rel: str) -> str:
        return os.path.join(path, urllib.parse.unquote(rel))

    if not active:
        return spark.createDataFrame([], schema)
    if not part_cols:
        return spark.read.schema(schema).parquet(
            *[abs_file(p) for p in active]
        )

    # one branch per distinct partition tuple; partition values are
    # stored in the log as strings (null = missing key/None)
    groups: dict[tuple, list[str]] = {}
    for rel, add in active.items():
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(abs_file(rel))
    branches = []
    for key, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(file_schema).parquet(*files)
        for c, v in zip(part_cols, key):
            lit = F.lit(v).cast(part_fields[c].dataType)
            df = df.withColumn(c, lit)
        branches.append(df.select(*[f.name for f in schema.fields]))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def write_delta_commit0(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> str:
    """Materialize ``df`` as a minimal but protocol-valid Delta table:
    data parquet + ``_delta_log/…0.json`` with protocol/metaData/add
    actions (minReaderVersion 1, commit 0 only — a fixture writer, not
    a transactional one; see module header)."""
    import uuid

    path = os.path.abspath(path)
    partition_by = partition_by or []
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    adds = []
    for root, _dirs, files in os.walk(path):
        if _LOG_DIR in root:
            continue
        for name in files:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, path)
            pv = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    c, v = seg.split("=", 1)
                    pv[c] = None if v == "__HIVE_DEFAULT_PARTITION__" else (
                        urllib.parse.unquote(v)
                    )
            adds.append(
                {
                    "add": {
                        "path": urllib.parse.quote(rel),
                        "partitionValues": pv,
                        "size": os.path.getsize(full),
                        "modificationTime": int(os.path.getmtime(full) * 1000),
                        "dataChange": True,
                    }
                }
            )

    # partition columns are NOT stored in the data files under
    # write.partitionBy, which matches Delta's layout exactly
    schema_json = json.loads(df.schema.json())
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema_json),
                "partitionColumns": partition_by,
                "configuration": {},
            }
        },
        *adds,
    ]
    log_dir = os.path.join(path, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return path


def append_delta_commit(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Transactionally append ``df`` to an existing (non-partitioned)
    jar-free Delta table: new uniquely-named data parquet files + one
    commit JSON of add actions at version N+1. Returns the new version.

    The commit file is written with ``O_CREAT | O_EXCL`` semantics
    (``open(..., "x")``): if a concurrent writer claimed the same
    version the open fails and the caller retries at N+2 — exactly
    Delta's optimistic-concurrency protocol (mutual exclusion on the
    commit file name is the whole transaction mechanism). Readers
    replaying the log see either the old or the new snapshot, never a
    torn one, because data files land before the commit that references
    them. Partitioned appends are out of scope here (the fixture
    writer's layout walk covers them at commit 0); the reference
    connector is the production writer.
    """
    import uuid

    path = os.path.abspath(path)
    meta = None
    for a in _log_actions(path):
        if "metaData" in a:
            meta = a["metaData"]
    if meta is None:
        raise FileNotFoundError(f"Delta log missing metaData: {path}")
    if meta.get("partitionColumns"):
        raise DeltaProtocolError(
            "append_delta_commit supports non-partitioned tables only"
        )

    staged = os.path.join(path, f"_staged_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staged)
    adds = []
    import glob as _glob

    for f in sorted(_glob.glob(os.path.join(staged, "part-*.parquet"))):
        final = f"part-{uuid.uuid4().hex}.parquet"
        os.replace(f, os.path.join(path, final))
        adds.append(
            {
                "add": {
                    "path": urllib.parse.quote(final),
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, final)),
                    "modificationTime": int(
                        os.path.getmtime(os.path.join(path, final)) * 1000
                    ),
                    "dataChange": True,
                }
            }
        )
    import shutil as _shutil

    _shutil.rmtree(staged, ignore_errors=True)

    log_dir = os.path.join(path, _LOG_DIR)
    while True:
        version = table_version(path) + 1
        try:
            with open(os.path.join(log_dir, f"{version:020d}.json"), "x") as f:
                for a in adds:
                    f.write(json.dumps(a) + "\n")
            return version
        except FileExistsError:
            continue  # lost the race — retry at the next version
