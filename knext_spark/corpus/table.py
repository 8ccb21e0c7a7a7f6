"""Iceberg-shaped docs corpus table.

The north rule mandates "Iceberg tables of source-code repositories at
10^12-file scale" with columns (repo, path, commit, lang, content).
No Iceberg runtime jar is available offline, so this module maintains
an Iceberg-*shaped* local lakehouse: bucket-partitioned Parquet plus a
snapshot/manifest JSON per write (append/overwrite), behind a thin API
that a real Iceberg catalog can replace verbatim
(`spark.read.table(...)` with the same schema).

Scale design: the table is written partitioned by ``repo_bucket``
(hash-bucket of repo, default 64) so (a) scans parallelize evenly even
with skewed repo sizes, (b) per-repo predicates prune partitions, and
(c) downstream per-document work is embarrassingly parallel. At 10^12
files the same layout holds with more buckets + Iceberg manifests; no
operator below ever collects the table to the driver.

Idempotent ingest (the reference skips existing files at
`/root/reference/src/knext/call.py:38-39`) = left-anti join on
(repo, path, commit) before append.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

_DATA_SUBDIR = "data"
_SNAP_SUBDIR = "snapshots"


def _snapshot(table_dir: str, operation: str, n_rows: int, n_buckets: int) -> None:
    snap_dir = os.path.join(table_dir, _SNAP_SUBDIR)
    os.makedirs(snap_dir, exist_ok=True)
    prev = sorted(os.listdir(snap_dir))
    snap = {
        "snapshot_id": uuid.uuid4().hex,
        "sequence_number": len(prev),
        "parent": json.load(open(os.path.join(snap_dir, prev[-1])))["snapshot_id"]
        if prev
        else None,
        "timestamp_ms": int(time.time() * 1000),
        "operation": operation,
        "added_rows": n_rows,
        "partition_spec": {"repo_bucket": f"bucket({n_buckets}, repo)"},
        "schema": [f.name for f in DOCS_SCHEMA.fields],
    }
    with open(os.path.join(snap_dir, f"snap-{len(prev):06d}.json"), "w") as f:
        json.dump(snap, f, indent=2)


def write_docs(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    n_buckets: int = 64,
    idempotent: bool = False,
) -> int:
    """Write rows into the docs table; returns rows written."""
    data_dir = os.path.join(table_dir, _DATA_SUBDIR)
    out = df.select(*[f.name for f in DOCS_SCHEMA.fields]).withColumn(
        "repo_bucket", F.pmod(F.xxhash64("repo"), F.lit(n_buckets))
    )
    if idempotent and os.path.exists(data_dir):
        existing = df.sparkSession.read.parquet(data_dir).select(
            "repo", "path", "commit"
        )
        out = out.join(existing, ["repo", "path", "commit"], "left_anti")
        mode = "append"
    n = out.count()
    out.write.mode(mode).partitionBy("repo_bucket").parquet(data_dir)
    _snapshot(table_dir, mode, n, n_buckets)
    return n


def read_docs(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(table_dir, _DATA_SUBDIR)).select(
        *[f.name for f in DOCS_SCHEMA.fields]
    )


def docs_from_rows(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(rows, DOCS_SCHEMA)
