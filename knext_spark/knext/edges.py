"""knext edge semantics as a single declarative Catalyst plan.

Reproduces, over the parsed docs DataFrame (one row per KGML document),
the reference pipeline `GenesInteractionParser._get_edges` →
`_parse_clique` → `_replace_with_cliques` → mode filters
(`/root/reference/src/knext/genes.py:45-296`), with zero Python on the
executors — everything below is built-in pyspark.sql.functions
(higher-order array functions, map lookups, window aggregation), so the
whole edge build stays inside whole-stage codegen and scales linearly
with document count: all work is keyed by doc_id and requires exactly
ONE shuffle (the per-(doc, src, dst) aggregation); dictionary lookups
that the reference does via Python dicts are per-document MapType
columns (no join, no broadcast needed, no skew).

Semantics reproduced (see SURVEY.md §2 for the operator inventory):

- naming (`utils.py:7-35`): default mode suffixes ``cpd:*``/``undefined``
  names with ``-<entry_id>``; unique mode suffixes every name.
- relation × subtype flatten (`genes.py:52-57`): one raw row per
  (relation, subtype) pair, document order preserved.
- compound value resolution (`genes.py:86-91`): subtype name
  ``compound`` carries an entry id in ``value`` — mapped through the
  naming dictionary, missing ids kept as-is.
- missing entry refs -> literal ``'nan'`` node (`genes.py:94-99`).
- clique expansion (`genes.py:117-155`): multi-gene entries expand to
  all pairs in exact ``itertools.combinations`` order; inter-entry
  pairs inherit the relation's (type, value, name); intra-entry pairs
  are relabeled ('type 2', 'undirectional', 'clique').
- aggregation (`genes.py:228-234`): per (src, dst), parallel subtype
  attrs comma-joined in input order; pair order lexicographic (pandas
  sorted groupby).
- keep-last overwrite (`genes.py:236`): independently-labeled clique
  rows overwrite inherited-attribute intra-entry pairs.
- mode filters (`genes.py:280-293`): genes mode drops path:* endpoints
  (and, in docs that have cpd/undefined endpoints, clique rows after
  propagation); mixed mode drops clique rows only.

Output ordering: ``out_seq`` reproduces the reference's TSV row order
(sorted aggregated pairs, then clique rows in generation order) so the
TSV sink can be byte-compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

EDGE_COLS = ["doc_id", "pathway", "entry1", "entry2", "type", "value", "name"]

_PAIR_T = "array<struct<a:string,b:string>>"


def _conv_expr(entry, unique: bool) -> Column:
    """Converted (display) name of one entry struct — `utils.py:7-35`."""
    parts = F.split(entry["name"], " ")
    if unique:
        conv = F.transform(parts, lambda n: F.concat_ws("-", n, entry["id"]))
    else:
        conv = F.transform(
            parts,
            lambda n: F.when(
                n.startswith("cpd:") | (n == F.lit("undefined")),
                F.concat_ws("-", n, entry["id"]),
            ).otherwise(n),
        )
    return F.array_join(conv, " ")


def _combinations(arr: Column) -> Column:
    """All 2-combinations of ``arr`` in itertools.combinations order
    (`genes.py:123,137` uses combinations(..., 2))."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.greatest(F.size(arr) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def _rel_subtype_count(relations: Column) -> Column:
    return F.aggregate(
        relations,
        F.lit(0),
        lambda acc, r: acc + F.coalesce(F.size(r["subtypes"]), F.lit(0)),
    )


def quarantine_docs(parsed: DataFrame) -> DataFrame:
    """Documents with no parsable edges — the reference raises
    FileNotFound and skips them (`genes.py:68-71`, `genes.py:328-330`);
    the engine routes them to a quarantine table with the same message."""
    bad = parsed.where(
        F.coalesce(_rel_subtype_count(F.col("relations")), F.lit(0)) == 0
    )
    return bad.select(
        "doc_id",
        "repo",
        "path",
        "pathway",
        F.concat(
            F.lit('ERROR: File "'),
            F.col("path"),
            F.lit('" cannot be parsed.\nVisit '),
            F.coalesce(F.col("link"), F.lit("?")),
            F.lit(
                "for pathway details.\nThere are likely no edges in which to parse..."
            ),
        ).alias("error"),
    )


def _raw_edges(parsed: DataFrame, unique: bool) -> DataFrame:
    """relation × subtype flatten + name/value resolution.

    Returns one row per (doc, relation, subtype) with the entry arrays
    already split (`genes.py:45-100`), plus positional indices
    (rel_idx, sub_idx) recording document order.
    """
    conv = F.map_from_entries(
        F.transform(
            "entries", lambda e: F.struct(e["id"], _conv_expr(e, unique))
        )
    )
    gmap = F.map_from_entries(
        F.transform(
            "entries",
            lambda e: F.struct(e["id"], F.array(e["x"], e["y"]).alias("pos")),
        )
    )
    rel = parsed.where(_rel_subtype_count(F.col("relations")) > 0).select(
        "doc_id",
        "pathway",
        conv.alias("conv"),
        gmap.alias("gmap"),
        F.posexplode("relations").alias("rel_idx", "rel"),
    )
    sub = rel.select(
        "doc_id",
        "pathway",
        "conv",
        "gmap",
        "rel_idx",
        F.col("rel.entry1").alias("e1_id"),
        F.col("rel.entry2").alias("e2_id"),
        F.col("rel.rtype").alias("types"),
        F.posexplode("rel.subtypes").alias("sub_idx", "sub"),
    )
    resolved_value = F.when(
        F.col("sub.name") == "compound",
        F.coalesce(F.col("conv")[F.col("sub.value")], F.col("sub.value")),
    ).otherwise(F.col("sub.value"))
    return sub.select(
        "doc_id",
        "pathway",
        "rel_idx",
        "sub_idx",
        "types",
        F.col("sub.name").alias("name"),
        resolved_value.alias("value"),
        F.split(F.coalesce(F.col("conv")[F.col("e1_id")], F.lit("nan")), " ").alias(
            "arr1"
        ),
        F.split(F.coalesce(F.col("conv")[F.col("e2_id")], F.lit("nan")), " ").alias(
            "arr2"
        ),
        F.col("gmap")[F.col("e1_id")].alias("pos1"),
        F.col("gmap")[F.col("e2_id")].alias("pos2"),
    )


def expanded_pairs(parsed: DataFrame, unique: bool = False) -> DataFrame:
    """The reference's ``df_out`` (`genes.py:133-155`): every 2-pair of
    (arr1 ++ arr2) inheriting the relation attrs, with graphics coords
    and a global sequence struct for order-faithful downstream steps."""
    raw = _raw_edges(parsed, unique)
    combined = F.concat("arr1", "arr2")
    return raw.select(
        "doc_id",
        "pathway",
        "rel_idx",
        "sub_idx",
        "types",
        "name",
        "value",
        "pos1",
        "pos2",
        F.posexplode(_combinations(combined)).alias("pair_idx", "pair"),
    ).select(
        "doc_id",
        "pathway",
        F.col("pair.a").alias("entry1"),
        F.col("pair.b").alias("entry2"),
        F.col("types").alias("type"),
        "value",
        "name",
        "pos1",
        "pos2",
        F.struct("rel_idx", "sub_idx", "pair_idx").alias("seq"),
    )


def _clique_both() -> Column:
    """The reference's per-row clique pair array: 2-combinations of
    each side's multi-gene entry (size > 1 gate), entry1-side pairs
    before entry2-side — shared verbatim by :func:`clique_pairs` and
    :func:`aggregated_with_cliques` so the two families can never
    drift."""
    side = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 1, _combinations(arr)
    ).otherwise(F.lit(None).cast(_PAIR_T))
    return F.concat(
        F.coalesce(side(F.col("arr1")), F.array().cast(_PAIR_T)),
        F.coalesce(side(F.col("arr2")), F.array().cast(_PAIR_T)),
    )


def clique_pairs(parsed: DataFrame, unique: bool = False) -> DataFrame:
    """The reference's ``cliquedf`` (`genes.py:120-131`): intra-entry
    pairs for entries aliasing >1 gene, labeled
    ('type 2', 'undirectional', 'clique'); entry1-side pairs precede
    entry2-side pairs within a row, preserving generation order."""
    raw = _raw_edges(parsed, unique)
    both = _clique_both()
    return raw.select(
        "doc_id",
        "pathway",
        "rel_idx",
        "sub_idx",
        F.posexplode(both).alias("pair_idx", "pair"),
    ).select(
        "doc_id",
        "pathway",
        F.col("pair.a").alias("entry1"),
        F.col("pair.b").alias("entry2"),
        F.lit("type 2").alias("type"),
        F.lit("undirectional").alias("value"),
        F.lit("clique").alias("name"),
        F.struct("rel_idx", "sub_idx", "pair_idx").alias("seq"),
    )


def aggregated_with_cliques(parsed: DataFrame, unique: bool = False) -> DataFrame:
    """`_replace_with_cliques` (`genes.py:220-237`): per-(src,dst)
    comma-join aggregation of df_out, then clique rows overwrite
    (keep-last). ``out_seq`` = reference TSV row order.

    Both pair families are generated from ONE pass over ``_raw_edges``:
    the expanded (kind 0) and clique (kind 1) pair arrays concatenate
    in-row and share a single explode + aggregation, with each clique
    row forming its own singleton group (its unique seq struct joins
    the group key). Composing ``expanded_pairs`` + ``clique_pairs``
    instead recomputes the whole parse->raw subtree per branch —
    column pruning specializes each branch's scan, so exchange reuse
    never fires (guide §2.4; measured ~4s/branch at the 10x bench).
    The aggregation output is value-identical: kind-0 groups comma-join
    exactly df_out's rows, kind-1 singleton groups reproduce each
    clique row verbatim."""
    raw = _raw_edges(parsed, unique)
    combined = F.concat("arr1", "arr2")
    both = _clique_both()
    p0 = F.transform(
        _combinations(combined),
        lambda x, i: F.struct(
            F.lit(0).alias("kind"),
            i.alias("pair_idx"),
            x["a"].alias("a"),
            x["b"].alias("b"),
        ),
    )
    p1 = F.transform(
        both,
        lambda x, i: F.struct(
            F.lit(1).alias("kind"),
            i.alias("pair_idx"),
            x["a"].alias("a"),
            x["b"].alias("b"),
        ),
    )
    ex = raw.select(
        "doc_id",
        "pathway",
        "rel_idx",
        "sub_idx",
        "types",
        "name",
        "value",
        F.explode(F.concat(p0, p1)).alias("p"),
    )
    rows = ex.select(
        "doc_id",
        "pathway",
        F.col("p.kind").alias("kind"),
        F.col("p.a").alias("entry1"),
        F.col("p.b").alias("entry2"),
        F.when(F.col("p.kind") == 0, F.col("types"))
        .otherwise(F.lit("type 2"))
        .alias("type"),
        F.when(F.col("p.kind") == 0, F.col("value"))
        .otherwise(F.lit("undirectional"))
        .alias("value"),
        F.when(F.col("p.kind") == 0, F.col("name"))
        .otherwise(F.lit("clique"))
        .alias("name"),
        F.struct(
            "rel_idx", "sub_idx", F.col("p.pair_idx").alias("pair_idx")
        ).alias("seq"),
    )
    merged = (
        rows.groupBy(
            "doc_id",
            "pathway",
            "entry1",
            "entry2",
            F.col("kind"),
            F.when(F.col("kind") == 1, F.col("seq")).alias("cseq"),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "type", "value", "name"))
            ).alias("rows")
        )
        .select(
            "doc_id",
            "pathway",
            "entry1",
            "entry2",
            F.array_join(F.transform("rows", lambda r: r["type"]), ",").alias("type"),
            F.array_join(F.transform("rows", lambda r: r["value"]), ",").alias(
                "value"
            ),
            F.array_join(F.transform("rows", lambda r: r["name"]), ",").alias("name"),
            F.col("kind").alias("priority"),
            F.col("cseq").alias("seq"),
        )
    )
    w = Window.partitionBy("doc_id", "entry1", "entry2").orderBy(
        F.desc("priority"),
        F.desc_nulls_last("seq.rel_idx"),
        F.desc_nulls_last("seq.sub_idx"),
        F.desc_nulls_last("seq.pair_idx"),
    )
    kept = merged.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    # reference row order: sorted aggregated pairs first, then clique
    # rows in generation order (pandas concat + drop_duplicates
    # keep='last' preserves positions of kept rows)
    order_w = Window.partitionBy("doc_id").orderBy(
        "priority",
        F.when(F.col("priority") == 0, F.col("entry1")),
        F.when(F.col("priority") == 0, F.col("entry2")),
        F.col("seq.rel_idx"),
        F.col("seq.sub_idx"),
        F.col("seq.pair_idx"),
    )
    return kept.withColumn("out_seq", F.row_number().over(order_w)).select(
        *EDGE_COLS, "out_seq"
    )


def mode_filters(xdf: DataFrame, mixed: bool) -> DataFrame:
    """genes/mixed mode filters up to (but excluding) propagation
    (`genes.py:280-293`). Adds per-doc ``has_cpd`` flag (computed, like
    the reference, before the path filter)."""
    if mixed:
        return xdf.where(F.col("name") != "clique").withColumn(
            "has_cpd", F.lit(False)
        )
    flag = (
        F.col("entry1").startswith("cpd:")
        | F.col("entry2").startswith("cpd:")
        | F.col("entry1").startswith("undefined")
        | F.col("entry2").startswith("undefined")
    ).cast("int")
    w = Window.partitionBy("doc_id")
    flagged = xdf.withColumn("has_cpd", F.max(flag).over(w) == 1)
    return flagged.where(
        (~F.col("entry1").startswith("path")) & (~F.col("entry2").startswith("path"))
    )


def build_edges(
    parsed: DataFrame,
    mixed: bool = False,
    unique: bool = False,
    propagate: str = "faithful",
) -> DataFrame:
    """Full per-document knext pipeline -> canonical edge table
    (doc_id, pathway, entry1, entry2, type, value, name, out_seq,
    weight). genes mode (mixed=False) propagates compounds/undefined
    nodes per document; see knext_spark.knext.propagate."""
    from knext_spark.knext.propagate import (
        propagate_contract,
        propagate_faithful_gated,
    )

    xdf = aggregated_with_cliques(parsed, unique)
    xdf = mode_filters(xdf, mixed)
    if not mixed:
        if propagate == "faithful":
            # single grouped pass, per-doc has_cpd gate inside — see
            # propagate_faithful_gated for why the two-branch split is
            # a full pipeline recompute
            xdf = propagate_faithful_gated(xdf)
        else:
            with_cpd = xdf.where(F.col("has_cpd")).drop("has_cpd")
            without = xdf.where(~F.col("has_cpd")).drop("has_cpd")
            prop = propagate_contract(with_cpd).where(F.col("name") != "clique")
            xdf = prop.unionByName(without)
    else:
        xdf = xdf.drop("has_cpd")
    return xdf.withColumn("weight", F.lit(1.0))
