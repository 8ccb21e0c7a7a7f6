"""Sinks: warehouse Parquet (primary) + reference-compatible TSV/JSON
exports.

The reference writes one TSV per pathway (`genes.py:296`) and one
graphics JSON per pathway (`genes.py:299-309`). At engine scale the
primary sink is a partitioned Parquet edge table; the per-pathway
TSV/JSON exports exist for byte-compatibility with reference consumers
and are driver-side only for small result sets (or distributed,
partitioned by pathway, via ``export_tsv_partitioned``).
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, functions as F

TSV_COLS = ["entry1", "entry2", "type", "value", "name"]


def write_edges_warehouse(edges: DataFrame, out_dir: str, n_buckets: int = 64) -> None:
    """Primary sink: Parquet partitioned by a doc-hash bucket so the
    10^12-document case spreads evenly regardless of per-repo skew."""
    (
        edges.withColumn("doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("doc_bucket")
        .parquet(out_dir)
    )


def export_tsv_per_doc(edges: DataFrame, out_dir: str) -> list[str]:
    """Reference-compatible one-TSV-per-pathway export (byte-exact to
    pandas ``to_csv(sep='\\t', index=False)``: QUOTE_MINIMAL, so
    comma-joined fields stay unquoted under the tab separator).
    Driver-side: intended for small exports / test parity."""
    os.makedirs(out_dir, exist_ok=True)
    rows = edges.orderBy("pathway", "out_seq").select("pathway", *TSV_COLS).collect()
    files: dict[str, list] = {}
    for r in rows:
        files.setdefault(r["pathway"], []).append([r[c] for c in TSV_COLS])
    written = []
    for pathway, data in files.items():
        path = os.path.join(out_dir, f"{pathway}.tsv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f, delimiter="\t", quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
            w.writerow(TSV_COLS)
            w.writerows(data)
        written.append(path)
    return written


def export_tsv_partitioned(edges: DataFrame, out_dir: str) -> None:
    """Distributed TSV export, one directory per pathway (scale path).

    Order within each pathway's file follows ``out_seq`` via
    repartition(pathway) + sortWithinPartitions — per-file order
    identical to a global orderBy, WITHOUT the full range-shuffle
    exchange a global sort would add over the entire edge table (the
    scale-killer flagged in round 1: at 100 TB a global orderBy is a
    cluster-wide range exchange just to get per-file ordering that a
    partition-local sort already guarantees)."""
    (
        edges.repartition("pathway")
        .sortWithinPartitions("pathway", "out_seq")
        .select("pathway", *TSV_COLS)
        .write.mode("overwrite")
        .partitionBy("pathway")
        .option("sep", "\t")
        .option("header", True)
        .csv(out_dir)
    )


def export_graphics_json(df_out: DataFrame, out_dir: str) -> list[str]:
    """Reference-compatible ``<pathway>_graphics.txt`` files."""
    from knext_spark.knext.graphics import positions_json

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for pathway, text in positions_json(df_out).items():
        path = os.path.join(out_dir, f"{pathway}_graphics.txt")
        with open(path, "w") as f:
            f.write(text)
        written.append(path)
    return written
