"""KEGG-ID -> NCBI / UniProt conversion as broadcast-join plans.

Reference: `/root/reference/src/knext/convert.py:75-115`
(`Converter._process_dataframe`) plus the mapping fetchers
`/root/reference/src/knext/utils.py:141-173` (`UP` 1:N multimap,
`NCBI` 1:1). The reference maps ids through a Python dict downloaded
from KEGG REST; offline, the engine takes a mapping DIMENSION TABLE
``(kegg_id, target_id)`` (1:N = multiple rows) and performs a broadcast
left join — the dim is tiny (one row per gene of one organism, ≤ a few
100k) against an arbitrarily large edge table, so the join never
shuffles the fact side.

Semantics reproduced step-for-step (SURVEY.md §2.2 P11-P14, §2.3 J5-J6):

- unique mode: extract the terminal ``-<entry_id>`` modifier
  (`convert.py:80-81`), strip it before mapping (`convert.py:84-85`),
  re-append after (`convert.py:107-110`). Reference quirk kept: a node
  without a modifier gets null entry (pandas ``str + NaN = NaN``).
- misses keep the original id (`fillna`, `convert.py:91-92`).
- 1:N mappings fan out via the join itself + explode-equivalent
  (`convert.py:104`); target order inside one source id is the dim's
  ``target_seq`` (KEGG response order; deterministic in our synth dims).
- prefix strip is a LITERAL replace of ``up:`` / ``ncbi-geneid:``
  (`convert.py:105-106`; pandas str.replace regex=False default).
- rows still starting with the organism code (unconverted genes) are
  dropped (`convert.py:113-114`).

Reference bugs NOT reproduced (SURVEY.md §8): ``NCBI()`` crashes on
duplicate keys (utils.py:172) — the engine treats both mappings as
multimaps; the graphics remap (`convert.py:53-62`) mis-indents its
conversion under ``except KeyError`` — the engine implements the
intended remap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UP_PREFIX = "up:"
NCBI_PREFIX = "ncbi-geneid:"
_MOD_RE = r"(-[0-9]+)"


def _grouped_mapping(mapping: DataFrame) -> DataFrame:
    """(kegg_id, target_id[, target_seq]) -> (kegg_id, targets array)
    with stable in-group order."""
    seq = "target_seq" if "target_seq" in mapping.columns else "target_id"
    return (
        mapping.groupBy("kegg_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(seq).alias("s"), "target_id"))),
                lambda r: r["target_id"],
            ).alias("targets")
        )
    )


def convert_edges(
    edges: DataFrame,
    mapping: DataFrame,
    species: str,
    prefix: str = NCBI_PREFIX,
    unique: bool = False,
) -> DataFrame:
    """Edge TSV frame (entry1, entry2, type, value, name [, out_seq]) ->
    converted frame, same columns. Row order: input order, fan-out in
    mapping order (pandas explode parity) via ``out_seq`` when present.
    """
    m = F.broadcast(_grouped_mapping(mapping))
    df = edges
    extra = [c for c in edges.columns if c not in ("entry1", "entry2")]
    # Reference quirk reproduced (convert.py:97-98, uniprot+unique
    # only): ','.join over an UNCONVERTED entry — a plain string, not a
    # list — joins its CHARACTERS ('path:x' -> 'p,a,t,h,:,x'). Visible
    # in real reference output on every non-gene node; kept for parity.
    char_join_quirk = unique and prefix == UP_PREFIX

    for side in ("entry1", "entry2"):
        key, match = f"k_{side}", f"m_{side}"
        if unique:
            df = df.withColumn(
                match,
                F.nullif(F.regexp_extract(side, _MOD_RE, 1), F.lit("")),
            ).withColumn(key, F.regexp_replace(side, _MOD_RE, ""))
        else:
            df = df.withColumn(match, F.lit(None).cast("string")).withColumn(
                key, F.col(side)
            )
        miss = (
            F.regexp_replace(F.col(key), "(.)(?=.)", "$1,")
            if char_join_quirk
            else F.col(key)
        )
        df = (
            df.join(m.withColumnRenamed("kegg_id", key), key, "left")
            .withColumn(
                f"t_{side}",
                F.coalesce(F.col("targets"), F.array(miss)),
            )
            .drop("targets", key)
        )

    # pandas double-explode order: entry1 fan-out outer, entry2 inner
    df = df.select(
        *extra,
        "m_entry1",
        "m_entry2",
        "t_entry2",
        F.posexplode("t_entry1").alias("x1", "e1"),
    ).select(
        *extra,
        "m_entry1",
        "m_entry2",
        "x1",
        "e1",
        F.posexplode("t_entry2").alias("x2", "e2"),
    )
    out1 = F.replace(F.col("e1"), F.lit(prefix), F.lit(""))
    out2 = F.replace(F.col("e2"), F.lit(prefix), F.lit(""))
    if unique:
        # quirk kept: null modifier (no -N suffix) -> null entry
        out1 = F.concat(out1, F.col("m_entry1"))
        out2 = F.concat(out2, F.col("m_entry2"))
    df = df.select(
        out1.alias("entry1"),
        out2.alias("entry2"),
        *extra,
        "x1",
        "x2",
    ).where(
        (~F.coalesce(F.col("entry1"), F.lit("")).startswith(species))
        & (~F.coalesce(F.col("entry2"), F.lit("")).startswith(species))
    )
    if "out_seq" in extra:
        df = df.orderBy("out_seq", "x1", "x2")
    cols = ["entry1", "entry2"] + [c for c in extra]
    return df.select(*cols)


def convert_positions(
    positions: DataFrame,
    mapping: DataFrame,
    species: str,
    prefix: str = NCBI_PREFIX,
    unique: bool = False,
) -> DataFrame:
    """Intended graphics-key remap (reference `convert.py:40-71`,
    implemented as designed, not as its mis-indented bug behaves):
    keys startswith(species) are converted (modifier stripped/re-added
    in unique mode, 1:N fan-out, prefix removed); other keys pass
    through unchanged. Input: (node, pos) [+ passthrough cols]."""
    m = F.broadcast(_grouped_mapping(mapping))
    extra = [c for c in positions.columns if c != "node"]
    is_gene = F.col("node").startswith(species)
    df = positions.withColumn(
        "m_node",
        F.when(
            F.lit(unique) & is_gene,
            F.nullif(F.regexp_extract("node", _MOD_RE, 1), F.lit("")),
        ),
    ).withColumn(
        "k_node",
        F.when(
            F.lit(unique) & is_gene, F.regexp_replace("node", _MOD_RE, "")
        ).otherwise(F.col("node")),
    )
    df = df.join(m.withColumnRenamed("kegg_id", "k_node"), "k_node", "left")
    converted = F.transform(
        "targets",
        lambda t: F.concat(
            F.replace(t, F.lit(prefix), F.lit("")),
            F.coalesce(F.col("m_node"), F.lit("")),
        ),
    )
    df = df.select(
        F.when(is_gene & F.col("targets").isNotNull(), converted)
        .when(is_gene, F.array().cast("array<string>"))  # unmapped gene: dropped
        .otherwise(F.array(F.col("node")))
        .alias("nodes"),
        *extra,
    )
    return df.select(F.explode("nodes").alias("node"), *extra)
