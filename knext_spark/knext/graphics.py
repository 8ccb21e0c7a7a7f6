"""Graphics (node position) extraction — reference `_parse_graphics`
(`/root/reference/src/knext/genes.py:299-309`).

The reference iterates the expanded pair frame building two dicts
(entry1->pos1, entry2->pos2) and merges them with dict2 winning; dict
insertion order defines JSON key order. Quirk reproduced exactly
(SURVEY.md §2.4 A5): positions attach per clique-pair — the FIRST
member of each pair gets the relation's pos1 and the SECOND pos2, even
for intra-entry pairs, so a gene can inherit its sibling entry's
coordinates. Present in the golden fixture; reproduced byte-for-byte.

DataFrame formulation: one row per (pair-side, occurrence); value =
last-wins by (side, seq); key order = first occurrence as entry1, then
first occurrence as entry2.
"""

from __future__ import annotations

import json
from pyspark.sql import DataFrame, Window, functions as F


def positions(df_out: DataFrame) -> DataFrame:
    """expanded_pairs -> (doc_id, pathway, node, pos array<int>, key_seq).

    Ordering column ``key_seq`` reproduces reference JSON key order.
    """
    occ1 = df_out.select(
        "doc_id",
        "pathway",
        F.col("entry1").alias("node"),
        F.col("pos1").alias("pos"),
        F.lit(1).alias("side"),
        "seq",
    )
    occ2 = df_out.select(
        "doc_id",
        "pathway",
        F.col("entry2").alias("node"),
        F.col("pos2").alias("pos"),
        F.lit(2).alias("side"),
        "seq",
    )
    occ = occ1.unionByName(occ2)
    value_w = (
        Window.partitionBy("doc_id", "node")
        .orderBy(
            F.desc("side"),
            F.desc("seq.rel_idx"),
            F.desc("seq.sub_idx"),
            F.desc("seq.pair_idx"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    key_w = (
        Window.partitionBy("doc_id", "node")
        .orderBy("side", "seq.rel_idx", "seq.sub_idx", "seq.pair_idx")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = occ.select(
        "doc_id",
        "pathway",
        "node",
        F.first("pos").over(value_w).alias("pos"),
        F.first(F.struct("side", "seq")).over(key_w).alias("key_seq"),
    ).dropDuplicates(["doc_id", "node"])
    return ranked


def positions_json(df_out: DataFrame) -> dict[str, str]:
    """Collect per-document positions into the reference's exact JSON
    text (`genes.py:307`): {pathway: json_string}. Driver-side — the
    positions table itself stays distributed; this is the tiny-export
    path mirroring the reference's one-file-per-pathway output."""
    rows = (
        positions(df_out)
        .orderBy(
            "pathway",
            "key_seq.side",
            "key_seq.seq.rel_idx",
            "key_seq.seq.sub_idx",
            "key_seq.seq.pair_idx",
        )
        .select("pathway", "node", "pos")
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        # missing graphics (e.g. literal-'nan' nodes) -> pandas NaN ->
        # json.dumps emits the non-standard literal `NaN` (genes.py:307)
        out.setdefault(r["pathway"], {})[r["node"]] = (
            list(r["pos"]) if r["pos"] is not None else float("nan")
        )
    return {pw: json.dumps(d) for pw, d in out.items()}
