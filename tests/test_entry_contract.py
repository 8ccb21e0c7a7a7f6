"""Driver-contract pre-validation: run every __spark_entry__ query at
sf0.001 and compare against its DuckDB oracle the way the driver does
at sf0.01 — row count, column names, and order-insensitive values.
Queries without an oracle get the rows-only check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return repr(round(v, 9))
    return str(v)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect()), cols


def _duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows), sorted(names)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_contract(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    got, got_cols = _spark_rows(df)
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only smoke (mirrors driver's weak check)
        return
    want, want_cols = _duck_rows(ddb, ORACLES[name])
    assert got_cols == want_cols, (name, got_cols, want_cols)
    assert len(got) == len(want), (name, len(got), len(want))
    assert got == want, (
        name,
        [r for r in got[:3] if r not in want],
        [r for r in want[:3] if r not in got],
    )


def test_pagerank_micros_oracle_second_graph(spark, ddb, tmp_path):
    """Robustness of the unrolled PageRank oracle beyond the driver's
    fixed graph: the engines fold their aggregation partials in
    different orders, so micros equality relies on no rank landing
    within ~1e-10 of a .5 rounding boundary. A second graph shape
    (mod=797: different node count, degrees, and rank values) plus the
    two driver SFs gives three independent data points that the
    boundary case does not occur on this corpus family."""
    import tempfile

    from pyspark.sql import functions as F

    from knext_spark.graph import pagerank

    edges = entrymod._edge_table(spark, SF_DIR, mod=797)
    res = pagerank(
        spark,
        edges,
        tol=0.0,
        max_iter=entrymod._PR_ITERS,
        checkpoint_dir=str(tmp_path / "pr797"),
        cadence=50,
    )
    df = res.state.select(
        "node", entrymod._micros(F.col("rank")).alias("rank_micros")
    )
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb, entrymod._pagerank_sql(entrymod._PR_ITERS, entrymod._edge_sql(797))
    )
    assert got_cols == want_cols
    assert len(got) == len(want)
    assert got == want


def test_hits_micros_oracle_second_graph(spark, ddb, tmp_path):
    """Same robustness evidence for the unrolled HITS oracle as
    test_pagerank_micros_oracle_second_graph: a second graph shape
    (mod=797) shows micros equality is not an artifact of the driver's
    fixed mod=1000 graph (the hub/auth values and max-normalization
    pivots all change with the shape)."""
    import tempfile

    from pyspark.sql import functions as F

    from knext_spark.graph import hits

    edges = entrymod._edge_table(spark, SF_DIR, mod=797)
    res = hits(
        spark,
        edges,
        tol=0.0,
        max_iter=entrymod._PR_ITERS,
        checkpoint_dir=str(tmp_path / "hits797"),
        cadence=50,
    )
    df = res.state.select(
        "node",
        entrymod._micros(F.col("hub")).alias("hub_micros"),
        entrymod._micros(F.col("auth")).alias("auth_micros"),
    )
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb, entrymod._hits_sql(entrymod._PR_ITERS, entrymod._edge_sql(797))
    )
    assert got_cols == want_cols
    assert len(got) == len(want)
    assert got == want


@pytest.mark.parametrize("n_docs,seed", [(13, 9), (31, 7)])
def test_kgml_oracles_second_corpus(spark, ddb, n_docs, seed):
    """Robustness of the regex-based KGML oracles beyond the driver's
    fixed (24, 42) corpus: different doc counts, different rng draws
    (relation shapes, subtype values, group sizes), plus the embedded
    hsa00232.xml fixture, at two extra (n_docs, seed) points. Guards
    the generator↔oracle coupling: a generator change that the RE2
    parse can't follow fails here, not silently at the driver gate."""
    from knext_spark.corpus import docs_from_rows, gen_corpus_rows
    from knext_spark.knext import build_edges
    from knext_spark.parse import parse_docs

    rows = gen_corpus_rows(n_docs=n_docs, seed=seed)
    parsed = parse_docs(docs_from_rows(spark, rows)).cache()
    sel = ["doc_id", "pathway", "entry1", "entry2", "type", "value", "name"]
    for build, sql in [
        (
            lambda: build_edges(parsed, mixed=True, unique=True),
            entrymod._kgml_mixed_sql(n_docs=n_docs, seed=seed),
        ),
        (
            lambda: build_edges(
                parsed, mixed=False, unique=True, propagate="contract"
            ),
            entrymod._kgml_contract_sql(n_docs=n_docs, seed=seed),
        ),
    ]:
        got, got_cols = _spark_rows(build().select(*sel))
        want, want_cols = _duck_rows(ddb, sql)
        assert got_cols == want_cols
        assert len(got) == len(want)
        assert got == want


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"node", "rank"}


def test_path_counts_oracle_second_graph(spark, ddb):
    """Unrolled σ-counting oracle at a second graph shape (mod=797):
    integers, so this is a pure structural-robustness check of the
    level unrolling (no float-boundary caveat like pagerank's)."""
    from pyspark.sql import functions as F

    from knext_spark.graph import shortest_path_counts

    edges = entrymod._edge_table(spark, SF_DIR, mod=797)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    df = shortest_path_counts(
        edges, seeds, max_iter=entrymod._SPC_HOPS
    ).select("seed", "node", "dist", "sigma")
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb,
        entrymod._path_counts_sql(entrymod._SPC_HOPS, entrymod._edge_sql(797)),
    )
    assert got_cols == want_cols
    assert got == want


def test_random_walks_oracle_second_graph(spark, ddb):
    """Unrolled hash-argmin walk oracle at a second graph shape
    (mod=797) — different adjacency, same deterministic choices."""
    from pyspark.sql import functions as F

    from knext_spark.graph import random_walks

    edges = entrymod._edge_table(spark, SF_DIR, mod=797)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    df = random_walks(
        edges,
        seeds,
        length=entrymod._WALK_LEN,
        walks_per_start=entrymod._WALKS_PER_START,
    ).select("start", "walk", "step", "node")
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb,
        entrymod._random_walks_sql(
            entrymod._WALK_LEN,
            entrymod._WALKS_PER_START,
            entrymod._edge_sql(797),
        ),
    )
    assert got_cols == want_cols
    assert got == want


def test_node2vec_oracle_second_graph(spark, ddb):
    """Unrolled node2vec-ticket oracle at a second graph shape
    (mod=797): different adjacency exercises all three weight classes
    under different tie patterns."""
    from pyspark.sql import functions as F

    from knext_spark.graph import node2vec_walks

    edges = entrymod._edge_table(spark, SF_DIR, mod=797)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    wr, wc, wf = entrymod._N2V_W
    df = node2vec_walks(
        edges,
        seeds,
        length=entrymod._WALK_LEN,
        walks_per_start=entrymod._WALKS_PER_START,
        w_return=wr,
        w_common=wc,
        w_far=wf,
    ).select("start", "walk", "step", "node")
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb,
        entrymod._node2vec_sql(
            entrymod._WALK_LEN,
            entrymod._WALKS_PER_START,
            entrymod._edge_sql(797),
        ),
    )
    assert got_cols == want_cols
    assert got == want


def test_ktruss_oracle_second_graph(spark, ddb):
    """Unrolled truss-peeling oracle at a second graph shape
    (mod=3001 — denser than the contract's mod=5000, so more edges
    actually peel and the idempotent-unroll claim is exercised on a
    different cascade)."""
    from knext_spark.graph import k_truss

    df = k_truss(entrymod._edge_table(spark, SF_DIR, mod=3001), k=4).select(
        "a", "b", "support"
    )
    got, got_cols = _spark_rows(df)
    want, want_cols = _duck_rows(
        ddb, entrymod._ktruss_sql(4, edge=entrymod._edge_sql(3001))
    )
    assert got_cols == want_cols
    assert got == want


def test_mis_coloring_oracle_second_graph(spark, ddb):
    """Unrolled priority-peeling oracles at a second graph shape
    (n=977, a prime, so the ring wrap and chord pattern differ from
    the contract's n=2000): both the dominating (MIS) and
    non-dominating (coloring) unrolls must stay hash-exact, and the
    unroll budgets must still cover the peel depth."""
    from pyspark.sql import functions as F

    from knext_spark.graph import coloring, mis

    edges = entrymod._chord_edges(spark, SF_DIR, n=977)
    got, got_cols = _spark_rows(
        mis(edges).select("node", F.col("round").alias("mis_round"))
    )
    want, want_cols = _duck_rows(
        ddb,
        entrymod._peel_sql(
            dominate=True, rounds=20, edge=entrymod._chord_sql(977)
        ),
    )
    assert got_cols == want_cols
    assert got == want

    got, got_cols = _spark_rows(coloring(edges))
    want, want_cols = _duck_rows(
        ddb,
        entrymod._peel_sql(
            dominate=False, rounds=28, edge=entrymod._chord_sql(977)
        ),
    )
    assert got_cols == want_cols
    assert got == want


def test_anf_oracle_second_graph_and_hops(spark, ddb):
    """ANF oracle at a second graph shape AND a different radius
    (hops=2 vs the contract's 3) — the fixed-H unroll must track the
    operator's parameter exactly."""
    from pyspark.sql import functions as F

    from knext_spark.graph import anf

    out = anf(entrymod._chord_edges(spark, SF_DIR, n=977), hops=2, k_hex=3)
    got, got_cols = _spark_rows(
        out.select(
            "node",
            "n_registers",
            "v_zero",
            entrymod._micros(F.col("estimate")).alias("estimate_micros"),
        )
    )
    want, want_cols = _duck_rows(
        ddb, entrymod._anf_sql(hops=2, k_hex=3, edge=entrymod._chord_sql(977))
    )
    assert got_cols == want_cols
    assert got == want
