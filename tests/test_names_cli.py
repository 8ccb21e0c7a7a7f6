"""Display-name enrichment (J4/P15 intended behavior) + CLI parser."""

from __future__ import annotations

from knext_spark.knext.names import add_names, synth_names_rows


def test_add_names_column_order_and_misses(spark, parsed_docs):
    from knext_spark.knext import build_edges

    edges = build_edges(parsed_docs, mixed=True, unique=True).limit(50)
    nodes = [
        r["n"]
        for r in edges.selectExpr("explode(array(entry1, entry2)) as n").collect()
    ]
    names = spark.createDataFrame(
        synth_names_rows(nodes), "node string, display_name string"
    )
    out = add_names(edges, names)
    # reference _add_names column order (genes.py:243-245)
    assert out.columns[:4] == ["entry1", "entry1_name", "entry2", "entry2_name"]
    rows = out.collect()
    assert len(rows) == 50
    named = {r["entry1"]: r["entry1_name"] for r in rows}
    for node, dn in named.items():
        if node.split("-")[0].startswith("undefined") or node == "nan":
            assert dn is None  # miss -> null (reference NaN)
        elif node.split("-")[0].startswith("cpd:"):
            assert dn.startswith("Compound ")


def test_cli_parser_all_verbs():
    from knext_spark.cli import build_parser

    p = build_parser()
    a = p.parse_args(["ingest", "--table", "/t", "--n-docs", "5"])
    assert a.verb == "ingest" and a.n_docs == 5
    a = p.parse_args(["parse-genes", "--table", "/t", "--out", "/o", "--unique"])
    assert a.unique
    a = p.parse_args(
        ["convert", "--edges", "/e", "--mapping", "/m", "--species", "hsa",
         "--out", "/o", "--uniprot"]
    )
    assert a.uniprot
    a = p.parse_args(["pagerank", "--edges", "/e", "--out", "/o", "--resume"])
    assert a.resume and a.alpha == 0.85
    a = p.parse_args(["hits", "--edges", "/e", "--out", "/o", "--max-iter", "50"])
    assert a.verb == "hits" and a.max_iter == 50
    a = p.parse_args(["scc", "--edges", "/e", "--out", "/o"])
    assert a.verb == "scc"
    a = p.parse_args(
        ["pagerank", "--edges", "/e", "--out", "/o",
         "--personalization", "/seeds"]
    )
    assert a.personalization == "/seeds"
    a = p.parse_args(["ktruss", "--edges", "/e", "--out", "/o", "-k", "4"])
    assert a.verb == "ktruss" and a.k == 4
    a = p.parse_args(["diameter", "--edges", "/e", "--out", "/o", "--sweeps", "3"])
    assert a.verb == "diameter" and a.sweeps == 3 and a.direction == "both"
    a = p.parse_args(["mis", "--edges", "/e", "--out", "/o"])
    assert a.verb == "mis" and a.cadence == 1
    a = p.parse_args(["coloring", "--edges", "/e", "--out", "/o", "--resume"])
    assert a.verb == "coloring" and a.resume
    a = p.parse_args(["anf", "--edges", "/e", "--out", "/o", "--hops", "4"])
    assert a.verb == "anf" and a.hops == 4
