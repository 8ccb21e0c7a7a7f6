"""Convert parity: engine convert_edges vs the executed reference
Converter._process_dataframe (`/root/reference/src/knext/convert.py`),
with the network-fetched conversion dict replaced by the same synthetic
mapping on both sides.

Modes: NCBI default, NCBI unique, UP default, UP unique (4 combos) on
engine-built TSV frames for every corpus pathway.
"""

from __future__ import annotations

import pandas as pd
import pytest

from knext_spark.corpus.mappings import (
    MAPPING_SCHEMA,
    ncbi_rows,
    uniprot_rows,
)
from knext_spark.knext.convert import NCBI_PREFIX, UP_PREFIX, convert_edges
from tests.ref_runner import _stub_typer, _REF_SRC

import sys


def _reference_converter(species, conversion, uniprot, unique):
    _stub_typer()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    from knext.convert import Converter  # reference, not ours

    c = object.__new__(Converter)  # bypass __init__ (it hits the network)
    c.species = species
    c.uniprot = uniprot
    c.unique = unique
    c.conversion = conversion
    c.prefix = UP_PREFIX if uniprot else NCBI_PREFIX
    return c


def _dict_of(rows, uniprot):
    d: dict[str, list] = {}
    for k, t, _ in rows:
        d.setdefault(k, []).append(t)
    if uniprot:
        return d  # UP(): kegg -> list (utils.py:141-156)
    return {k: v[0] for k, v in d.items()}  # NCBI(): kegg -> str


@pytest.fixture(scope="module")
def tsv_frames(spark, parsed_docs):
    """Per-(pathway, unique) engine TSV frames + the corpus gene ids."""
    from knext_spark.knext import build_edges

    out = {}
    for unique in (False, True):
        edges = build_edges(parsed_docs, mixed=True, unique=unique)
        pdf = (
            edges.orderBy("pathway", "out_seq")
            .select("pathway", "entry1", "entry2", "type", "value", "name")
            .toPandas()
        )
        for pathway, g in pdf.groupby("pathway"):
            out[(pathway, unique)] = g.drop(columns="pathway").reset_index(
                drop=True
            )
    genes = set()
    for e in parsed_docs.selectExpr("explode(entries) as e").collect():
        if e["e"]["type"] == "gene":
            genes.update(e["e"]["name"].split(" "))
    return out, sorted(genes)


@pytest.mark.parametrize("uniprot", [False, True], ids=["ncbi", "up"])
@pytest.mark.parametrize("unique", [False, True], ids=["default", "unique"])
def test_convert_parity(spark, tsv_frames, uniprot, unique):
    frames, gene_ids = tsv_frames
    rows = uniprot_rows(gene_ids) if uniprot else ncbi_rows(gene_ids)
    # every corpus org shares the first 2 letters 'ts' except hsa; use
    # per-pathway species = its org prefix
    mapping = spark.createDataFrame(rows, MAPPING_SCHEMA)
    prefix = UP_PREFIX if uniprot else NCBI_PREFIX
    conv_dict = _dict_of(rows, uniprot)

    n_checked = 0
    for (pathway, uq), pdf in frames.items():
        if uq != unique or pdf.empty:
            continue
        species = pathway[:3]
        ref = _reference_converter(species, conv_dict, uniprot, unique)
        want = ref._process_dataframe(pdf.copy())

        sdf = spark.createDataFrame(
            pdf, "entry1 string, entry2 string, type string, value string, name string"
        )
        got = convert_edges(sdf, mapping, species, prefix=prefix, unique=unique)
        got_pdf = got.toPandas()[["entry1", "entry2", "type", "value", "name"]]

        # normalize nulls BEFORE sorting (pandas astype(str) renders
        # NaN as 'nan', Spark nulls as 'None'), then compare sorted
        def rows(p):
            return sorted(
                tuple("nan" if v in ("None", "nan") else v for v in r)
                for r in p.astype(str).itertuples(index=False, name=None)
            )

        got_rows, want_rows = rows(got_pdf), rows(want)
        assert got_rows == want_rows, (pathway, uniprot, unique)
        n_checked += 1
    assert n_checked >= 5
