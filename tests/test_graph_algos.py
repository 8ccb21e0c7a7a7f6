"""Graph-algorithm oracles (SURVEY.md §5.2 item 3).

PageRank vs nx.pagerank allclose(1e-6); connected components exact
(partition equality, canonical min label); LPA exact vs the pinned
deterministic rule re-implemented over NetworkX structures; triangles
exact vs nx.triangles. Graphs: edges derived from the KGML corpus plus
adversarial synthetics (hub star, chain, dangling, self-loop, islands,
parallel edges).
"""

from __future__ import annotations

import random

import networkx as nx
import numpy as np
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

# scipy is not installed in this sandbox, so nx.pagerank's default
# scipy backend is unavailable; _pagerank_python is NetworkX's own
# shipped power iteration with identical semantics — the oracle the
# north star pins to.
nx_pagerank = _pagerank_python
import pytest
from pyspark.sql import functions as F

from knext_spark.graph import (
    connected_components,
    degree_histogram,
    label_propagation,
    pagerank,
    triangle_count,
)


def _adversarial_graphs() -> dict[str, list[tuple[str, str]]]:
    rng = random.Random(7)
    hub = [("hub", f"n{i}") for i in range(40)] + [(f"n{i}", "hub") for i in range(5)]
    chain = [(f"c{i}", f"c{i+1}") for i in range(30)]
    dangling = [("a", "b"), ("b", "c"), ("x", "c")]  # c dangles
    self_loop = [("s", "s"), ("s", "t"), ("t", "u")]
    islands = [("i1", "i2"), ("i3", "i4"), ("i5", "i6"), ("i2", "i1")]
    parallel = [("p", "q"), ("p", "q"), ("q", "r"), ("p", "q")]
    er = []
    names = [f"v{i}" for i in range(60)]
    for _ in range(180):
        er.append((rng.choice(names), rng.choice(names)))
    return {
        "hub": hub,
        "chain": chain,
        "dangling": dangling,
        "self_loop": self_loop,
        "islands": islands,
        "parallel": parallel,
        "erdos": er,
    }


GRAPHS = _adversarial_graphs()


@pytest.fixture(scope="module")
def corpus_edges(spark, parsed_docs):
    from knext_spark.knext import build_edges

    e = build_edges(parsed_docs, mixed=True, unique=True)
    return [
        (r["entry1"], r["entry2"])
        for r in e.select("entry1", "entry2").collect()
    ]


def _edge_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src string, dst string, weight double"
    )


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_pagerank_vs_networkx(spark, tmp_path, gname):
    pairs = GRAPHS[gname]
    # nx.DiGraph collapses parallel edges -> feed the engine deduped
    # pairs for parity (engine semantics on duplicates = MultiDiGraph).
    dedup = list(dict.fromkeys(pairs))
    G = nx.DiGraph()
    G.add_edges_from(dedup)
    want = nx_pagerank(G, alpha=0.85, tol=1e-6, max_iter=100)

    res = pagerank(
        spark,
        _edge_df(spark, dedup),
        checkpoint_dir=str(tmp_path / gname),
        run_id="t",
        cadence=25,
    )
    got = {r["node"]: r["rank"] for r in res.state.collect()}
    assert res.converged
    assert set(got) == set(want)
    keys = sorted(want)
    assert np.allclose(
        [got[k] for k in keys], [want[k] for k in keys], atol=1e-6
    ), gname


def test_pagerank_corpus_and_salted(spark, tmp_path, corpus_edges):
    dedup = list(dict.fromkeys(corpus_edges))
    G = nx.DiGraph()
    G.add_edges_from(dedup)
    want = nx_pagerank(G, alpha=0.85, tol=1e-6, max_iter=100)
    for salt_k, run in [(1, "plain"), (4, "salted")]:
        res = pagerank(
            spark,
            _edge_df(spark, dedup),
            checkpoint_dir=str(tmp_path / run),
            run_id=run,
            salt_k=salt_k,
            cadence=25,
        )
        got = {r["node"]: r["rank"] for r in res.state.collect()}
        keys = sorted(want)
        assert np.allclose(
            [got[k] for k in keys], [want[k] for k in keys], atol=1e-6
        ), run


def test_pagerank_resume_identical(spark, tmp_path):
    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    full = pagerank(
        spark, _edge_df(spark, pairs), checkpoint_dir=str(tmp_path / "f"), run_id="r"
    )
    # simulate a kill after superstep 3: run capped, then resume
    part = pagerank(
        spark,
        _edge_df(spark, pairs),
        checkpoint_dir=str(tmp_path / "p"),
        run_id="r",
        max_iter=3,
    )
    assert not part.converged
    resumed = pagerank(
        spark,
        _edge_df(spark, pairs),
        checkpoint_dir=str(tmp_path / "p"),
        run_id="r",
        resume=True,
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    a = {r["node"]: r["rank"] for r in full.state.collect()}
    b = {r["node"]: r["rank"] for r in resumed.state.collect()}
    keys = sorted(a)
    assert np.allclose([a[k] for k in keys], [b[k] for k in keys], atol=1e-12)


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_connected_components_exact(spark, tmp_path, gname):
    pairs = GRAPHS[gname]
    G = nx.Graph()
    G.add_edges_from(pairs)
    want = {frozenset(c) for c in nx.connected_components(G)}

    res = connected_components(
        spark, _edge_df(spark, pairs), checkpoint_dir=str(tmp_path / gname)
    )
    rows = res.state.collect()
    by_label: dict[str, set] = {}
    for r in rows:
        by_label.setdefault(r["component"], set()).add(r["node"])
    got = {frozenset(v) for v in by_label.values()}
    assert got == want, gname
    # canonical label = min node of its component
    for label, members in by_label.items():
        assert label == min(members)


def _lpa_oracle(pairs, max_iter=20):
    """The pinned deterministic LPA rule (see knext_spark/graph/lpa.py)."""
    G = nx.Graph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    labels = {n: n for n in G.nodes}
    for _ in range(max_iter):
        new = {}
        for n in G.nodes:
            nbrs = list(G.neighbors(n))
            if not nbrs:
                new[n] = labels[n]
                continue
            freq: dict[str, int] = {}
            for v in nbrs:
                freq[labels[v]] = freq.get(labels[v], 0) + 1
            top = max(freq.values())
            new[n] = min(l for l, c in freq.items() if c == top)
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_lpa_exact_vs_pinned_oracle(spark, tmp_path, gname):
    pairs = [(a, b) for a, b in GRAPHS[gname] if a != b]
    if not pairs:
        pytest.skip("no non-loop edges")
    want = _lpa_oracle(pairs)
    res = label_propagation(
        spark, _edge_df(spark, pairs), checkpoint_dir=str(tmp_path / gname)
    )
    got = {r["node"]: r["label"] for r in res.state.collect()}
    # isolated-by-self-loop nodes only exist in self_loop graph; engine
    # includes all endpoint nodes
    for n, l in want.items():
        assert got[n] == l, (gname, n)


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_triangles_exact(spark, gname):
    pairs = GRAPHS[gname]
    G = nx.Graph()
    G.add_edges_from(pairs)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(_edge_df(spark, pairs)).collect()
    }
    assert got == want, gname


def test_triangles_corpus(spark, corpus_edges):
    G = nx.Graph()
    G.add_edges_from(corpus_edges)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(
            _edge_df(spark.builder.getOrCreate() if False else spark, corpus_edges)
        ).collect()
    }
    assert got == want


def test_degree_histogram(spark):
    df = _edge_df(spark, GRAPHS["hub"])
    hist = {r["bucket"]: r["n_nodes"] for r in degree_histogram(df).collect()}
    # hub has out-degree 40 -> bucket floor(log2(40)) = 5
    assert hist.get(5) == 1


def test_pagerank_sums_to_one(spark, tmp_path):
    for gname, pairs in GRAPHS.items():
        dedup = list(dict.fromkeys(pairs))
        res = pagerank(
            spark,
            _edge_df(spark, dedup),
            checkpoint_dir=str(tmp_path / ("s" + gname)),
            cadence=25,
        )
        total = res.state.agg(F.sum("rank")).collect()[0][0]
        assert abs(total - 1.0) < 1e-9, gname


def test_cc_resume_identical(spark, tmp_path):
    """Kill-at-superstep-1 resume for connected components (north rule:
    resumable mid-iteration). The resumed run must converge to exactly
    the labels of an uninterrupted run."""
    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    e = _edge_df(spark, pairs).select("src", "dst")
    full = connected_components(spark, e, checkpoint_dir=str(tmp_path / "f"))
    part = connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "p"), max_iter=1
    )
    assert not part.converged
    resumed = connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    a = {r["node"]: r["component"] for r in full.state.collect()}
    b = {r["node"]: r["component"] for r in resumed.state.collect()}
    assert a == b


def test_lpa_resume_identical(spark, tmp_path):
    """Kill-at-superstep-2 resume for label propagation: synchronous
    deterministic updates make interrupted + resumed bit-identical to
    uninterrupted."""
    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    e = _edge_df(spark, pairs).select("src", "dst")
    full = label_propagation(spark, e, max_iter=10, checkpoint_dir=str(tmp_path / "f"))
    part = label_propagation(spark, e, max_iter=2, checkpoint_dir=str(tmp_path / "p"))
    resumed = label_propagation(
        spark, e, max_iter=10, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.iterations == full.iterations
    a = {r["node"]: r["label"] for r in full.state.collect()}
    b = {r["node"]: r["label"] for r in resumed.state.collect()}
    assert a == b


def test_graph_algos_no_block_residue(spark, tmp_path):
    """Every iterative algorithm must leave ZERO persisted-RDD residue:
    localCheckpointed superstep layers are RDD-level persisted, so a
    retire path that misses them (root-only plan match, or the
    pre-commit frame a commit superstep replaces with its Parquet
    read-back) leaks blocks for the whole session — the GC-pressure
    regression the deterministic-retirement design exists to prevent.
    Covers both cadence=1 (every step commits: the leak is the
    pre-commit frame) and cadence>1 (the leak is the Project-wrapped
    intermediate localCheckpoint)."""
    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    e = _edge_df(spark, pairs)
    jsc = spark.sparkContext._jsc

    before = jsc.getPersistentRDDs().size()
    pagerank(spark, e, max_iter=5, tol=0.0, checkpoint_dir=str(tmp_path / "pr1"))
    pagerank(
        spark, e, max_iter=5, tol=0.0, cadence=10, checkpoint_dir=str(tmp_path / "pr2")
    )
    connected_components(spark, e, checkpoint_dir=str(tmp_path / "cc1"))
    connected_components(spark, e, cadence=10, checkpoint_dir=str(tmp_path / "cc2"))
    label_propagation(spark, e, max_iter=5, checkpoint_dir=str(tmp_path / "l1"))
    label_propagation(
        spark, e, max_iter=5, cadence=10, checkpoint_dir=str(tmp_path / "l2")
    )
    # encode_ids runs: the dictionary build pins an eager localCheckpoint
    # that must be freed once the Parquet materialization is committed
    connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "cc3"), encode_ids=True
    ).state.count()
    label_propagation(
        spark, e, max_iter=5, checkpoint_dir=str(tmp_path / "l3"), encode_ids=True
    ).state.count()
    after = jsc.getPersistentRDDs().size()
    assert after == before


def test_salted_cc_lpa_parity(spark, tmp_path):
    """salt_k must not change results — salting only re-routes a hot
    key's join rows across k tasks. Hub graph included (the case
    salting exists for: BENCH.md §5 measures the unsalted hub cost)."""
    for gname in ("hub", "erdos"):
        pairs = list(dict.fromkeys(GRAPHS[gname]))
        e = _edge_df(spark, pairs)
        a = {r["node"]: r["component"] for r in connected_components(
            spark, e, checkpoint_dir=str(tmp_path / f"c1{gname}")
        ).state.collect()}
        b = {r["node"]: r["component"] for r in connected_components(
            spark, e, checkpoint_dir=str(tmp_path / f"c2{gname}"), salt_k=4
        ).state.collect()}
        assert a == b
        la = {r["node"]: r["label"] for r in label_propagation(
            spark, e, max_iter=6, checkpoint_dir=str(tmp_path / f"l1{gname}")
        ).state.collect()}
        lb = {r["node"]: r["label"] for r in label_propagation(
            spark, e, max_iter=6, checkpoint_dir=str(tmp_path / f"l2{gname}"),
            salt_k=4,
        ).state.collect()}
        assert la == lb


def test_dictionary_order_preserving_dense(spark):
    from knext_spark.graph.encode import build_dictionary
    from knext_spark.graph.superstep import unpersist_checkpoint

    names = sorted({a for p in GRAPHS["erdos"] for a in p})
    nodes = spark.createDataFrame([(n,) for n in names], "node string")
    ddf = build_dictionary(nodes, 8)
    dic = {r["node"]: r["nid"] for r in ddf.collect()}
    assert sorted(dic.values()) == list(range(len(names)))  # dense 0..n-1
    assert [dic[n] for n in names] == sorted(dic.values())  # order-preserving
    unpersist_checkpoint(ddf)  # non-materialized form: caller frees


def test_dictionary_materialized_single_instantiation(spark, tmp_path):
    """The dictionary must come from ONE durable materialization:
    repeated downstream actions (multiple decode joins, actions after
    the encode_ids wrapper returns) must read identical dense nids —
    never a recomputed range shuffle (RangePartitioner samples its
    bounds with an RDD-id-derived seed, so recomputation is NOT
    deterministic across plan instantiations)."""
    import os

    from knext_spark.graph.encode import build_dictionary

    names = sorted({a for p in GRAPHS["erdos"] for a in p})
    nodes = spark.createDataFrame([(n,) for n in names], "node string")
    d_dir = str(tmp_path / "dic")
    ddf = build_dictionary(nodes, 8, materialize_dir=d_dir)
    assert os.path.exists(os.path.join(d_dir, "_SUCCESS"))
    first = {r["node"]: r["nid"] for r in ddf.collect()}
    second = {r["node"]: r["nid"] for r in ddf.collect()}  # a later action
    assert first == second
    assert sorted(first.values()) == list(range(len(names)))
    # reuse=True (the resume path) must read back, not rewrite
    files_before = sorted(os.listdir(d_dir))
    again = build_dictionary(nodes, 8, materialize_dir=d_dir, reuse=True)
    assert {r["node"]: r["nid"] for r in again.collect()} == first
    assert sorted(os.listdir(d_dir)) == files_before


def test_encoded_resume_reuses_dictionary(spark, tmp_path):
    """Kill/resume with encode_ids=True: the resumed run must decode
    through the SAME materialized dictionary the killed run encoded
    with (the committed iterate's nids were assigned by it), and the
    final labels must match a raw-id run exactly."""
    import os

    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    e = _edge_df(spark, pairs)
    ck = str(tmp_path / "p")
    connected_components(spark, e, max_iter=1, checkpoint_dir=ck, encode_ids=True)
    d_dir = os.path.join(ck, "cc", "default", "dictionary")
    files = sorted(os.listdir(d_dir))
    resumed = connected_components(
        spark, e, checkpoint_dir=ck, resume=True, encode_ids=True
    )
    assert sorted(os.listdir(d_dir)) == files  # reused, not rebuilt
    assert resumed.converged
    full = connected_components(spark, e, checkpoint_dir=str(tmp_path / "f"))
    a = {r["node"]: r["component"] for r in full.state.collect()}
    b = {r["node"]: r["component"] for r in resumed.state.collect()}
    assert a == b


def test_encode_ids_parity(spark, tmp_path):
    """encode_ids=True must decode back to the raw-id results: exact
    for cc/lpa (order preservation keeps min-label canonicalization
    and LPA tie-breaks intact), allclose for pagerank (float summation
    order may differ under re-keyed aggregation)."""
    pairs = list(dict.fromkeys(GRAPHS["erdos"]))
    e = _edge_df(spark, pairs)

    raw = {r["node"]: r["rank"] for r in pagerank(
        spark, e, max_iter=20, checkpoint_dir=str(tmp_path / "r")
    ).state.collect()}
    enc = {r["node"]: r["rank"] for r in pagerank(
        spark, e, max_iter=20, checkpoint_dir=str(tmp_path / "e"), encode_ids=True
    ).state.collect()}
    assert set(raw) == set(enc)
    assert all(abs(raw[k] - enc[k]) < 1e-12 for k in raw)

    raw_cc = {r["node"]: r["component"] for r in connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "rc")
    ).state.collect()}
    enc_cc = {r["node"]: r["component"] for r in connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "ec"), encode_ids=True
    ).state.collect()}
    assert raw_cc == enc_cc  # exact, incl. the min-node canonical label

    raw_lp = {r["node"]: r["label"] for r in label_propagation(
        spark, e, max_iter=8, checkpoint_dir=str(tmp_path / "rl")
    ).state.collect()}
    enc_lp = {r["node"]: r["label"] for r in label_propagation(
        spark, e, max_iter=8, checkpoint_dir=str(tmp_path / "el"), encode_ids=True
    ).state.collect()}
    assert raw_lp == enc_lp  # bit-identical: tie-breaks preserved


def test_hot_broadcast_lpa_parity(spark, tmp_path):
    """hot_threshold must not change results — hot keys' fan-out rows
    just take the broadcast path instead of the co-partitioned shuffle
    join. Forced low threshold makes EVERY key hot on the hub graph
    (broadcast path carries all messages) and a mid threshold splits
    hub vs cold on erdos; both must equal the plain run, including a
    salted+hot combination."""
    for gname, thr in (("hub", 1), ("erdos", 1), ("erdos", 3), ("hub", 10)):
        pairs = list(dict.fromkeys(GRAPHS[gname]))
        e = _edge_df(spark, pairs)
        plain = {r["node"]: r["label"] for r in label_propagation(
            spark, e, max_iter=6,
            checkpoint_dir=str(tmp_path / f"hp{gname}{thr}"),
            hot_threshold=None,
        ).state.collect()}
        hot = {r["node"]: r["label"] for r in label_propagation(
            spark, e, max_iter=6,
            checkpoint_dir=str(tmp_path / f"hh{gname}{thr}"),
            hot_threshold=thr,
        ).state.collect()}
        assert hot == plain
        both = {r["node"]: r["label"] for r in label_propagation(
            spark, e, max_iter=6,
            checkpoint_dir=str(tmp_path / f"hb{gname}{thr}"),
            hot_threshold=thr, salt_k=3,
        ).state.collect()}
        assert both == plain


def test_k_core_vs_networkx(spark, corpus_edges):
    """Exact k-core parity with NetworkX on the KGML-derived corpus
    graph and on adversarial shapes: same node set, same within-core
    degrees, empty when k exceeds the degeneracy."""
    from knext_spark.graph import k_core

    for k in (2, 3):
        G = nx.Graph()
        G.add_edges_from((a, b) for a, b in corpus_edges if a != b)
        core = nx.k_core(G, k)
        got = {
            r["node"]: r["core_deg"]
            for r in k_core(_edge_df(spark, corpus_edges), k=k).collect()
        }
        assert got == {n: d for n, d in core.degree()}
    # path graph: peeling depth equals the path length (worst case) and
    # the 2-core of a tree is empty
    path = [(f"p{i}", f"p{i+1}") for i in range(12)]
    assert k_core(_edge_df(spark, path), k=2).count() == 0
    # cycle: every node survives the 2-core with degree 2
    cyc = [(f"c{i}", f"c{(i+1) % 6}") for i in range(6)]
    got = {r["node"]: r["core_deg"] for r in k_core(_edge_df(spark, cyc), k=2).collect()}
    assert got == {f"c{i}": 2 for i in range(6)}


def test_k_core_rejects_k_below_one(spark):
    """k=0 would require isolated-node membership that an edge-derived
    core cannot represent (nx.k_core(G, 0) keeps them) — explicit
    ValueError instead of a silent divergence."""
    import pytest as _pytest

    from knext_spark.graph import k_core

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError, match="k >= 1"):
        k_core(e, k=0)


def test_k_core_resume_identical(spark, tmp_path):
    """Kill-at-round-2 resume for k-core peeling (north rule: every
    superstep checkpoints so a killed job resumes mid-iteration). The
    peeling order is deterministic, so interrupted + resumed must be
    bit-identical to an uninterrupted run, converge at the same round,
    and carry per-round peeled counts in the metrics."""
    import networkx as nx

    from knext_spark.graph import k_core_run

    # two triangles plus a dangling chain off one of them: the chain
    # peels one node per round (p3, then p2, then p1) before the
    # 2-core (the triangles) remains — several supersteps to resume
    # across
    e = (
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
        + [("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
        + [("a1", "p1"), ("p1", "p2"), ("p2", "p3")]
    )
    df = spark.createDataFrame(e, "src string, dst string")
    full = k_core_run(spark, df, k=2, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    assert any(m.get("peeled", 0) > 0 for m in full.metrics)

    killed = k_core_run(
        spark, df, k=2, checkpoint_dir=str(tmp_path / "p"), max_iter=2
    )
    assert not killed.converged  # the "kill": capped before fixpoint
    resumed = k_core_run(
        spark, df, k=2, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations

    want = {r["node"]: r["core_deg"] for r in full.state.collect()}
    got = {r["node"]: r["core_deg"] for r in resumed.state.collect()}
    assert got == want
    G = nx.Graph(e)
    assert want == dict(nx.k_core(G, 2).degree())


# ------------------------------------------------------- topological levels


def test_topological_levels_match_networkx_generations(spark):
    """On a DAG, Kahn levels equal nx.topological_generations indices
    exactly, and no node carries -1 (the DAG check)."""
    import networkx as nx

    from knext_spark.graph import topological_levels

    e = [(0, 2), (0, 3), (1, 3), (2, 4), (3, 4), (3, 5), (4, 6), (5, 6), (0, 7)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r["node"]: r["level"] for r in topological_levels(df).collect()}
    G = nx.DiGraph(e)
    want = {
        n: lvl
        for lvl, gen in enumerate(nx.topological_generations(G))
        for n in gen
    }
    assert got == want
    assert -1 not in got.values()


def test_topological_levels_cycles_self_loops_string_ids(spark):
    """Cycle handling on string node ids: nodes ON a cycle (incl. a
    self-loop) and every node DOWNSTREAM of one flag -1; the clean
    chain still levels, and a node fed by BOTH a leveled and a cyclic
    predecessor stays -1 (it never becomes in-degree-0)."""
    from knext_spark.graph import topological_levels

    e = [
        ("a", "b"), ("b", "c"),           # clean chain: 0, 1, 2
        ("d", "e"), ("e", "d"),           # 2-cycle
        ("e", "f"), ("c", "f"),           # f: cyclic + leveled preds
        ("g", "g"), ("g", "h"),           # self-loop poisons h
    ]
    df = spark.createDataFrame(e, "src string, dst string")
    got = {r["node"]: r["level"] for r in topological_levels(df).collect()}
    assert got == {
        "a": 0, "b": 1, "c": 2,
        "d": -1, "e": -1, "f": -1, "g": -1, "h": -1,
    }


def test_topological_levels_resume_identical(spark, tmp_path):
    """Kill-at-round-2 resume for Kahn peeling (north rule: every
    superstep checkpoints so a killed job resumes mid-iteration). A
    chain levels one node per round, so several supersteps to resume
    across; interrupted + resumed must be bit-identical to an
    uninterrupted run."""
    from knext_spark.graph import topological_levels_run

    e = [(i, i + 1) for i in range(6)] + [(10, 11), (11, 10), (11, 12)]
    df = spark.createDataFrame(e, "src long, dst long")
    full = topological_levels_run(spark, df, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    assert any(m.get("leveled", 0) > 0 for m in full.metrics)

    killed = topological_levels_run(
        spark, df, checkpoint_dir=str(tmp_path / "p"), max_iter=2
    )
    assert not killed.converged  # the "kill": capped before fixpoint
    resumed = topological_levels_run(
        spark, df, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    want = {r["node"]: r["level"] for r in full.state.collect()}
    got = {r["node"]: r["level"] for r in resumed.state.collect()}
    assert got == want
    assert want[0] == 0 and want[5] == 5  # the chain leveled fully
    assert want[10] == want[11] == want[12] == -1  # the cycle + tail


# ---------------------------------------------------------------- HITS

from networkx.algorithms.link_analysis.hits_alg import _hits_python

# same story as _pagerank_python above: nx.hits' default backend needs
# scipy (absent here); _hits_python is NetworkX's own shipped classic
# Kleinberg power iteration — the recurrence knext_spark.graph.hits
# pins to (see its module docstring).
nx_hits = _hits_python


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_hits_vs_networkx(spark, tmp_path, gname):
    from knext_spark.graph import hits

    pairs = GRAPHS[gname]
    dedup = list(dict.fromkeys(pairs))  # nx.DiGraph parity (see pagerank test)
    G = nx.DiGraph()
    G.add_edges_from(dedup)
    want_h, want_a = nx_hits(G, max_iter=500, tol=1e-8)

    res = hits(
        spark,
        _edge_df(spark, dedup),
        tol=1e-8,
        max_iter=500,
        checkpoint_dir=str(tmp_path / gname),
        run_id="t",
        cadence=25,
    )
    assert res.converged
    got_h = {r["node"]: r["hub"] for r in res.state.collect()}
    got_a = {r["node"]: r["auth"] for r in res.state.collect()}
    assert set(got_h) == set(want_h)
    keys = sorted(want_h)
    assert np.allclose(
        [got_h[k] for k in keys], [want_h[k] for k in keys], atol=1e-6
    ), gname
    assert np.allclose(
        [got_a[k] for k in keys], [want_a[k] for k in keys], atol=1e-6
    ), gname


def test_hits_weighted_and_encoded(spark, tmp_path):
    from knext_spark.graph import hits

    weighted = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 0.5), ("d", "a", 4.0), ("d", "b", 1.0),
        ("e", "c", 2.5), ("b", "e", 1.5),
    ]
    G = nx.DiGraph()
    G.add_weighted_edges_from(weighted)
    want_h, want_a = nx_hits(G, max_iter=500, tol=1e-8)

    df = spark.createDataFrame(
        weighted, "src string, dst string, weight double"
    )
    keys = sorted(want_h)
    for run, enc in [("plain", False), ("encoded", True)]:
        res = hits(
            spark,
            df,
            tol=1e-8,
            max_iter=500,
            checkpoint_dir=str(tmp_path / run),
            run_id=run,
            cadence=25,
            encode_ids=enc,
        )
        got = {r["node"]: (r["hub"], r["auth"]) for r in res.state.collect()}
        assert np.allclose(
            [got[k][0] for k in keys], [want_h[k] for k in keys], atol=1e-6
        ), run
        assert np.allclose(
            [got[k][1] for k in keys], [want_a[k] for k in keys], atol=1e-6
        ), run


def test_hits_resume_identical(spark, tmp_path):
    from knext_spark.graph import hits

    # hub converges in ~12 supersteps — enough to kill/resume across
    # while keeping the commit-per-superstep (cadence=1) cost bounded
    pairs = list(dict.fromkeys(GRAPHS["hub"]))
    full = hits(
        spark, _edge_df(spark, pairs), checkpoint_dir=str(tmp_path / "f"), run_id="r"
    )
    # simulate a kill after superstep 3: run capped, then resume
    part = hits(
        spark,
        _edge_df(spark, pairs),
        checkpoint_dir=str(tmp_path / "p"),
        run_id="r",
        max_iter=3,
    )
    assert not part.converged
    resumed = hits(
        spark,
        _edge_df(spark, pairs),
        checkpoint_dir=str(tmp_path / "p"),
        run_id="r",
        resume=True,
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    a = {r["node"]: (r["hub"], r["auth"]) for r in full.state.collect()}
    b = {r["node"]: (r["hub"], r["auth"]) for r in resumed.state.collect()}
    keys = sorted(a)
    assert np.allclose(
        [a[k] for k in keys], [b[k] for k in keys], atol=1e-12
    )


def test_hits_fixed_iteration_mode(spark, tmp_path):
    from knext_spark.graph import hits

    pairs = list(dict.fromkeys(GRAPHS["hub"]))
    res = hits(
        spark,
        _edge_df(spark, pairs),
        tol=0.0,
        max_iter=4,
        checkpoint_dir=str(tmp_path / "fx"),
        run_id="fx",
        cadence=10,
    )
    assert not res.converged
    assert res.iterations == 4
    rows = res.state.collect()
    # both vectors sum-normalized on return
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["auth"] for r in rows) - 1.0) < 1e-9


# ---------------------------------------------------- personalized pagerank
@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_personalized_pagerank_vs_networkx(spark, tmp_path, gname):
    """nx.pagerank(personalization=...) parity allclose(1e-6): teleport
    and dangling redistribution both follow the normalized seed
    vector; unseeded nodes get p=0."""
    dedup = list(dict.fromkeys(GRAPHS[gname]))
    G = nx.DiGraph()
    G.add_edges_from(dedup)
    seeds = sorted(G.nodes)[::3]
    pers = {v: float(i % 4 + 1) for i, v in enumerate(seeds)}
    want = nx_pagerank(
        G, alpha=0.85, personalization=pers, tol=1e-6, max_iter=100
    )
    pdf = spark.createDataFrame(list(pers.items()), "node string, p double")
    res = pagerank(
        spark,
        _edge_df(spark, dedup),
        tol=1e-6,
        max_iter=100,
        personalization=pdf,
        checkpoint_dir=str(tmp_path / gname),
        run_id="t",
        cadence=25,
    )
    got = {r["node"]: r["rank"] for r in res.state.collect()}
    assert res.converged
    assert set(got) == set(want)
    keys = sorted(want)
    assert np.allclose(
        [got[k] for k in keys], [want[k] for k in keys], atol=1e-6
    ), gname


def test_personalized_pagerank_out_of_graph_mass(spark, tmp_path):
    """nx banks personalization mass on out-of-graph keys in the
    normalization and lets it leak (the rank vector sums to < 1 at the
    fixpoint); the engine's driver-side rank-sum recursion reproduces
    that — plain, salted, and encoded runs all match nx."""
    dedup = list(dict.fromkeys(GRAPHS["erdos"]))
    G = nx.DiGraph()
    G.add_edges_from(dedup)
    pers = {v: 1.0 for v in sorted(G.nodes)[::5]}
    pers["not-in-graph"] = 3.0
    want = nx_pagerank(
        G, alpha=0.85, personalization=pers, tol=1e-6, max_iter=100
    )
    assert sum(want.values()) < 0.999  # the leak is real on this input
    pdf = spark.createDataFrame(list(pers.items()), "node string, p double")
    keys = sorted(want)
    for run, kw in [
        ("plain", {}),
        ("salted", {"salt_k": 4}),
        ("encoded", {"encode_ids": True}),
    ]:
        res = pagerank(
            spark,
            _edge_df(spark, dedup),
            tol=1e-6,
            max_iter=100,
            personalization=pdf,
            checkpoint_dir=str(tmp_path / run),
            run_id=run,
            cadence=25,
            **kw,
        )
        got = {r["node"]: r["rank"] for r in res.state.collect()}
        assert np.allclose(
            [got[k] for k in keys], [want[k] for k in keys], atol=1e-6
        ), run


def test_personalized_pagerank_resume_identical(spark, tmp_path):
    """Kill-and-resume with out-of-graph personalization mass: the
    resumed run re-derives the tracked rank-vector total from the
    committed iterate (one extra aggregate), so resumed == full."""
    dedup = list(dict.fromkeys(GRAPHS["erdos"]))
    pers = {v: 1.0 for v in sorted({a for a, _ in dedup})[::4]}
    pers["ghost"] = 2.0
    pdf = spark.createDataFrame(list(pers.items()), "node string, p double")
    e = _edge_df(spark, dedup)
    full = pagerank(
        spark, e, personalization=pdf,
        checkpoint_dir=str(tmp_path / "f"), run_id="r",
    )
    part = pagerank(
        spark, e, personalization=pdf,
        checkpoint_dir=str(tmp_path / "p"), run_id="r", max_iter=3,
    )
    assert not part.converged
    resumed = pagerank(
        spark, e, personalization=pdf,
        checkpoint_dir=str(tmp_path / "p"), run_id="r", resume=True,
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    a = {r["node"]: r["rank"] for r in full.state.collect()}
    b = {r["node"]: r["rank"] for r in resumed.state.collect()}
    keys = sorted(a)
    assert np.allclose([a[k] for k in keys], [b[k] for k in keys], atol=1e-12)


def test_personalized_pagerank_rejects_zero_mass(spark, tmp_path):
    pdf = spark.createDataFrame([("a", 0.0)], "node string, p double")
    with pytest.raises(ValueError, match="positive total mass"):
        pagerank(
            spark,
            _edge_df(spark, [("a", "b")]),
            personalization=pdf,
            checkpoint_dir=str(tmp_path),
        )


# ------------------------------------------------ strongly connected comps
def _nx_scc_labels(pairs):
    G = nx.DiGraph()
    G.add_edges_from(pairs)
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_scc_vs_networkx(spark, tmp_path, gname):
    """Exact nx.strongly_connected_components parity (min-member
    canonical label) across the adversarial shapes: hubs, a 30-deep
    chain (worst case for trim depth), dangling, self-loops, islands,
    parallel edges, and a random digraph."""
    from knext_spark.graph import strongly_connected_components

    dedup = list(dict.fromkeys(GRAPHS[gname]))
    want = _nx_scc_labels(dedup)
    res = strongly_connected_components(
        spark,
        _edge_df(spark, dedup).select("src", "dst"),
        checkpoint_dir=str(tmp_path / gname),
        run_id="t",
    )
    got = {r["node"]: r["scc"] for r in res.state.collect()}
    assert res.converged
    assert got == want, gname


def test_scc_encoded_parity_and_corpus(spark, tmp_path, corpus_edges):
    """Encoded run decodes to exactly the raw-id labels (order-
    preserving encoding; every comparison in scc is a min over ids),
    on the KGML-derived corpus graph."""
    from knext_spark.graph import strongly_connected_components

    dedup = list(dict.fromkeys(corpus_edges))
    want = _nx_scc_labels(dedup)
    for run, enc in [("raw", False), ("enc", True)]:
        res = strongly_connected_components(
            spark,
            _edge_df(spark, dedup).select("src", "dst"),
            checkpoint_dir=str(tmp_path / run),
            run_id=run,
            encode_ids=enc,
        )
        got = {r["node"]: r["scc"] for r in res.state.collect()}
        assert got == want, run


def test_scc_resume_identical(spark, tmp_path):
    """Kill after round 1 of a graph that needs two outer rounds (an
    SCC feeding an SCC: the downstream cycle is only colorable once
    the upstream one is extracted), then resume: labels must equal an
    uninterrupted run's exactly."""
    from knext_spark.graph import strongly_connected_components

    pairs = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),  # upstream 3-cycle
        ("a3", "b1"),                               # DAG edge down
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),  # downstream 3-cycle
        ("b3", "t1"),                               # trimmed tail
    ]
    e = _edge_df(spark, pairs).select("src", "dst")
    full = strongly_connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "f"), run_id="r"
    )
    assert full.iterations >= 2
    part = strongly_connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "p"), run_id="r", max_rounds=1
    )
    assert not part.converged
    resumed = strongly_connected_components(
        spark, e, checkpoint_dir=str(tmp_path / "p"), run_id="r", resume=True
    )
    assert resumed.converged
    a = {r["node"]: r["scc"] for r in full.state.collect()}
    b = {r["node"]: r["scc"] for r in resumed.state.collect()}
    assert a == b == _nx_scc_labels(pairs)


# --------------------------------------------------- linkpred (round 5)
@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_clustering_coefficient_vs_networkx(spark, gname):
    from knext_spark.graph import clustering_coefficient

    pairs = GRAPHS[gname]
    G = nx.Graph()
    G.add_edges_from(pairs)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.clustering(G)
    got = {
        r["node"]: r["clustering"]
        for r in clustering_coefficient(_edge_df(spark, pairs)).collect()
    }
    assert set(got) == set(want), gname
    for n in want:
        assert abs(got[n] - want[n]) < 1e-12, (gname, n)


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_neighbor_jaccard_vs_networkx(spark, gname):
    """Exactly nx.jaccard_coefficient over non-edges, restricted to
    pairs with >= 1 common neighbor (zero-score pairs are not emitted
    by design), on the simple undirected graph."""
    from knext_spark.graph import neighbor_jaccard

    pairs = [(a, b) for a, b in GRAPHS[gname] if a != b]
    if not pairs:
        pytest.skip("no non-loop edges")
    G = nx.Graph()
    G.add_edges_from(pairs)
    want = {}
    for u, v in nx.non_edges(G):
        common = len(set(G[u]) & set(G[v]))
        if common >= 1:
            a, b = sorted((u, v))
            union = len(set(G[u]) | set(G[v]))
            want[(a, b)] = (common, union, common / union)
    rows = neighbor_jaccard(_edge_df(spark, pairs)).collect()
    got = {
        (r["a"], r["b"]): (r["common"], r["union_size"], r["jaccard"]) for r in rows
    }
    assert set(got) == set(want), gname
    for k, (c, u, j) in want.items():
        gc, gu, gj = got[k]
        assert (gc, gu) == (c, u), (gname, k)
        assert abs(gj - j) < 1e-12, (gname, k)


def test_neighbor_jaccard_hub_governor(spark):
    """max_apex_degree drops wedges THROUGH hubs but keeps true
    degrees in the denominator; include_existing keeps adjacent
    pairs."""
    from knext_spark.graph import neighbor_jaccard

    pairs = GRAPHS["hub"]
    capped = neighbor_jaccard(
        _edge_df(spark, pairs), max_apex_degree=10
    ).collect()
    # every pair's only shared neighbor is the hub (degree >> 10)
    assert capped == []
    kept = neighbor_jaccard(
        _edge_df(spark, pairs), max_apex_degree=10, include_existing=True
    ).collect()
    assert kept == []
    # include_existing surfaces ADJACENT pairs that share a neighbor —
    # i.e. triangle edges: in a 3-cycle every edge (u,v) shares the
    # third node, and there are no non-edges at all
    tri = [("u", "v"), ("v", "w"), ("w", "u")]
    assert neighbor_jaccard(_edge_df(spark, tri)).collect() == []
    rows = neighbor_jaccard(_edge_df(spark, tri), include_existing=True).collect()
    assert sorted((r["a"], r["b"], r["common"], r["union_size"]) for r in rows) == [
        ("u", "v", 1, 3), ("u", "w", 1, 3), ("v", "w", 1, 3)
    ]


@pytest.mark.parametrize("gname", ["erdos", "hub", "islands"])
def test_adamic_adar_vs_networkx(spark, gname):
    """adamic_adar=True adds sum_w 1/ln(deg(w)) in the SAME wedge
    aggregation; nx.adamic_adar_index parity at float tolerance (ln is
    1-ulp libm arithmetic, deliberately not hash-gated)."""
    from knext_spark.graph import neighbor_jaccard

    pairs = [(a, b) for a, b in GRAPHS[gname] if a != b]
    G = nx.Graph()
    G.add_edges_from(pairs)
    want = {
        tuple(sorted((u, v))): s
        for u, v, s in nx.adamic_adar_index(G)
        if s > 0
    }
    rows = neighbor_jaccard(_edge_df(spark, pairs), adamic_adar=True).collect()
    got = {(r["a"], r["b"]): r["adamic_adar"] for r in rows}
    assert set(got) == set(want), gname
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (gname, k)


# ------------------------------------------------------- BFS (round 5)
def _nx_bfs(pairs, seeds, direction="out"):
    """Hand-rolled multi-source BFS (this networkx build does not
    export multi_source_shortest_path_length at top level)."""
    G = nx.DiGraph()
    G.add_edges_from(pairs)
    for s in seeds:
        G.add_node(s)
    H = G.reverse() if direction == "in" else (G.to_undirected() if direction == "both" else G)
    dist = {s: 0 for s in set(seeds)}
    frontier = sorted(dist)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in H.successors(u) if H.is_directed() else H.neighbors(u):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


@pytest.mark.parametrize("gname", sorted(GRAPHS))
@pytest.mark.parametrize("direction", ["out", "both"])
def test_bfs_distances_vs_networkx(spark, gname, direction):
    from knext_spark.graph import bfs_distances

    pairs = GRAPHS[gname]
    all_nodes = sorted({n for p in pairs for n in p})
    seeds = all_nodes[::7] or all_nodes[:1]  # deterministic sparse seed set
    want = _nx_bfs(pairs, seeds, direction)
    e = _edge_df(spark, pairs)
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(e, s, direction=direction).collect()}
    # engine reports every graph node: unreached = None
    assert set(got) == {n for p in pairs for n in p} | set(seeds)
    for n, d in got.items():
        assert d == want.get(n), (gname, direction, n, d, want.get(n))
    for n, d in want.items():
        assert got[n] == d


def test_bfs_distances_resume_identical(spark, tmp_path):
    """Kill after 1 round of a 4-hop chain, resume: distances must be
    bit-identical to an uninterrupted run."""
    from knext_spark.graph import bfs_distances_run

    pairs = [(f"c{i}", f"c{i+1}") for i in range(8)]
    e = _edge_df(spark, pairs).select("src", "dst")
    s = spark.createDataFrame([("c0",)], "node string")
    full = bfs_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "f"), run_id="r"
    )
    assert full.converged and full.iterations == 9  # 8 hops + empty round
    part = bfs_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "p"), run_id="r", max_iter=1
    )
    assert not part.converged
    resumed = bfs_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "p"), run_id="r", resume=True
    )
    assert resumed.converged
    a = sorted((r["node"], r["dist"]) for r in full.state.collect())
    b = sorted((r["node"], r["dist"]) for r in resumed.state.collect())
    assert a == b == [(f"c{i}", i) for i in range(9)]


def test_bfs_seed_outside_graph(spark):
    """A seed absent from the edge table is still a root (dist 0) and
    the graph stays NULL-distanced if unreachable from it."""
    from knext_spark.graph import bfs_distances

    e = _edge_df(spark, [("a", "b")]).select("src", "dst")
    s = spark.createDataFrame([("z",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_distances(e, s).collect()}
    assert got == {"z": 0, "a": None, "b": None}


# --------------------------------------------- landmarks (round 5)
@pytest.mark.parametrize("gname", ["erdos", "chain", "islands", "hub"])
def test_landmark_distances_vs_per_seed_bfs(spark, gname):
    """(seed, node, dist) equals an independent per-seed BFS for every
    landmark."""
    from knext_spark.graph import landmark_distances

    pairs = GRAPHS[gname]
    all_nodes = sorted({n for p in pairs for n in p})
    seeds = all_nodes[::5] or all_nodes[:1]
    e = _edge_df(spark, pairs)
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in landmark_distances(e, s).collect()
    }
    want = {}
    for seed in seeds:
        for n, d in _nx_bfs(pairs, [seed], "out").items():
            want[(seed, n)] = d
    assert got == want, gname


def test_harmonic_and_closeness_sampled(spark):
    """Reciprocal/mean aggregations over the landmark table match a
    Python recomputation from the same per-seed BFS distances."""
    from knext_spark.graph import (
        closeness_centrality_sampled,
        harmonic_centrality_sampled,
    )

    pairs = GRAPHS["erdos"]
    all_nodes = sorted({n for p in pairs for n in p})
    seeds = all_nodes[::6]
    e = _edge_df(spark, pairs)
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    per_seed = {seed: _nx_bfs(pairs, [seed], "out") for seed in seeds}
    want_h, want_c = {}, {}
    for n in all_nodes:
        ds = [per_seed[seed][n] for seed in seeds
              if n in per_seed[seed] and per_seed[seed][n] > 0]
        if ds:
            want_h[n] = sum(1.0 / d for d in ds)
            want_c[n] = len(ds) / sum(ds)
    got_h = {r["node"]: r["harmonic"]
             for r in harmonic_centrality_sampled(e, s).collect()}
    got_c = {r["node"]: r["closeness"]
             for r in closeness_centrality_sampled(e, s).collect()}
    assert set(got_h) == set(want_h) and set(got_c) == set(want_c)
    for n in want_h:
        assert abs(got_h[n] - want_h[n]) < 1e-9
        assert abs(got_c[n] - want_c[n]) < 1e-12


def test_landmark_resume_identical(spark, tmp_path):
    from knext_spark.graph import landmark_distances_run

    pairs = [(f"c{i}", f"c{i+1}") for i in range(6)] + [("z0", "c3")]
    e = _edge_df(spark, pairs).select("src", "dst")
    s = spark.createDataFrame([("c0",), ("z0",)], "node string")
    full = landmark_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "f"), run_id="r"
    )
    part = landmark_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "p"), run_id="r", max_iter=1
    )
    assert not part.converged
    resumed = landmark_distances_run(
        spark, e, s, checkpoint_dir=str(tmp_path / "p"), run_id="r", resume=True
    )
    assert resumed.converged
    a = sorted(map(tuple, full.state.collect()))
    b = sorted(map(tuple, resumed.state.collect()))
    assert a == b
    assert ("z0", "c6", 4) in set(a)  # z0 -> c3 -> ... -> c6


# ------------------------------------------------- modularity / link features


def test_modularity_vs_networkx(spark):
    """Scalar Q == nx.algorithms.community.modularity on every
    adversarial graph shape, labeling = len(node) % 3 (computable
    identically on both sides); the float SUM over communities is the
    only engine-ordered accumulation, hence the tolerance gate here
    (the per-community rows are hash-gated in the driver contract)."""
    from knext_spark.graph import modularity

    for gname, pairs in sorted(GRAPHS.items()):
        G = nx.Graph()
        G.add_edges_from((a, b) for a, b in pairs if a != b)
        if G.number_of_edges() == 0:
            continue
        labels_df = spark.createDataFrame(
            [(n, len(n) % 3) for n in G.nodes], "node string, label long"
        )
        comms: dict[int, set] = {}
        for n in G.nodes:
            comms.setdefault(len(n) % 3, set()).add(n)
        want = nx.algorithms.community.modularity(G, comms.values())
        got = modularity(_edge_df(spark, pairs), labels_df)
        assert abs(got - want) < 1e-9, gname


def test_modularity_contributions_sum_and_empty(spark):
    from knext_spark.graph import community_contributions, modularity

    pairs = GRAPHS["erdos"]
    nodes = sorted({n for p in pairs for n in p})
    labels_df = spark.createDataFrame(
        [(n, len(n) % 3) for n in nodes], "node string, label long"
    )
    rows = community_contributions(_edge_df(spark, pairs), labels_df).collect()
    q = modularity(_edge_df(spark, pairs), labels_df)
    assert abs(sum(r["contribution"] for r in rows) - q) < 1e-12
    # resolution scales only the degree term
    q2 = modularity(_edge_df(spark, pairs), labels_df, resolution=2.0)
    assert q2 < q
    with pytest.raises(Exception):
        modularity(
            _edge_df(spark, [("a", "a")]), labels_df
        )  # only a self-loop -> empty simple graph


def test_link_features_vs_networkx(spark):
    """adamic_adar / resource_allocation / preferential_attachment all
    equal the NetworkX functions on the engine's own candidate pairs
    (floats with tolerance — accumulation order; PA exact integers)."""
    import math

    from knext_spark.graph import neighbor_jaccard

    pairs = GRAPHS["erdos"]
    G = nx.Graph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    out = neighbor_jaccard(
        _edge_df(spark, pairs),
        min_common=1,
        adamic_adar=True,
        resource_allocation=True,
        preferential_attachment=True,
    ).collect()
    assert out, "expected candidate pairs on the erdos graph"
    cand = [(r["a"], r["b"]) for r in out]
    aa = {(u, v): p for u, v, p in nx.adamic_adar_index(G, cand)}
    ra = {(u, v): p for u, v, p in nx.resource_allocation_index(G, cand)}
    pa = {(u, v): p for u, v, p in nx.preferential_attachment(G, cand)}
    for r in out:
        k = (r["a"], r["b"])
        assert math.isclose(r["adamic_adar"], aa[k], rel_tol=1e-9), k
        assert math.isclose(r["resource_allocation"], ra[k], rel_tol=1e-9), k
        assert int(r["preferential_attachment"]) == pa[k], k


# ---------------------------------------------------------- betweenness


def _nx_sigma(G, s):
    """Exact (dist, #shortest-paths) from s via BFS-order DP."""
    dist = nx.single_source_shortest_path_length(G, s)
    sigma = {v: 0 for v in dist}
    sigma[s] = 1
    for v in sorted(dist, key=dist.get):
        if v == s:
            continue
        for u in G.predecessors(v):
            if u in dist and dist[u] + 1 == dist[v]:
                sigma[v] += sigma[u]
    return dist, sigma


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_shortest_path_counts_vs_networkx(spark, gname):
    """σ (path counts) and dist exact against an nx-derived DP on
    every adversarial shape, all nodes as seeds."""
    from knext_spark.graph import shortest_path_counts

    pairs = GRAPHS[gname]
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    nodes = sorted(G.nodes)
    if not nodes:
        pytest.skip("self-loop-only graph")
    seeds = spark.createDataFrame([(n,) for n in nodes], "node string")
    got = {
        (r["seed"], r["node"]): (r["dist"], r["sigma"])
        for r in shortest_path_counts(
            _edge_df(spark, pairs), seeds, max_iter=100
        ).collect()
    }
    want = {}
    for s in nodes:
        dist, sigma = _nx_sigma(G, s)
        for v, d in dist.items():
            want[(s, v)] = (d, sigma[v])
    assert got == want, gname


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_betweenness_exact_vs_networkx(spark, tmp_path, gname):
    """With sources = every node, betweenness_sampled IS exact
    directed betweenness: nx.betweenness_centrality(normalized=False)
    at 1e-9 (δ is a float sum — tolerance, same as the other
    order-dependent scores)."""
    from knext_spark.graph import betweenness_sampled

    pairs = GRAPHS[gname]
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    if G.number_of_nodes() == 0:
        pytest.skip("self-loop-only graph")
    seeds = spark.createDataFrame([(n,) for n in sorted(G.nodes)], "node string")
    out = {
        r["node"]: r["betweenness"]
        for r in betweenness_sampled(
            spark,
            _edge_df(spark, pairs),
            seeds,
            checkpoint_dir=str(tmp_path / gname),
        ).collect()
    }
    want = nx.betweenness_centrality(G, normalized=False)
    assert set(out) == set(want), gname
    for n in want:
        assert abs(out[n] - want[n]) < 1e-9, (gname, n)


def test_path_counts_resume_identical(spark, tmp_path):
    """Kill-at-round-1 resume for the Brandes forward pass (north
    rule: resumable supersteps) — resumed state bit-identical to an
    uninterrupted run."""
    from knext_spark.graph import shortest_path_counts_run

    pairs = GRAPHS["chain"]
    seeds = spark.createDataFrame([("c0",), ("c10",)], "node string")
    full = shortest_path_counts_run(
        spark, _edge_df(spark, pairs), seeds, checkpoint_dir=str(tmp_path / "f")
    )
    assert full.converged
    killed = shortest_path_counts_run(
        spark,
        _edge_df(spark, pairs),
        seeds,
        checkpoint_dir=str(tmp_path / "p"),
        max_iter=1,
    )
    assert not killed.converged
    resumed = shortest_path_counts_run(
        spark,
        _edge_df(spark, pairs),
        seeds,
        checkpoint_dir=str(tmp_path / "p"),
        resume=True,
    )
    assert resumed.converged
    assert sorted(map(tuple, resumed.state.collect())) == sorted(
        map(tuple, full.state.collect())
    )


def test_betweenness_sampled_partial_sum(spark, tmp_path):
    """A seed SAMPLE yields exactly the partial Brandes sum over those
    sources (the documented semantics: callers rescale by n/k if they
    want the nx k= estimator)."""
    from knext_spark.graph import betweenness_sampled

    pairs = GRAPHS["erdos"]
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    sample = sorted(G.nodes)[::3]
    seeds = spark.createDataFrame([(n,) for n in sample], "node string")
    out = {
        r["node"]: r["betweenness"]
        for r in betweenness_sampled(
            spark,
            _edge_df(spark, pairs),
            seeds,
            checkpoint_dir=str(tmp_path / "s"),
        ).collect()
    }
    # reference partial sum: Brandes per sampled source via nx shortest
    # path DP (delta accumulation)
    want = {v: 0.0 for v in G.nodes}
    for s in sample:
        dist, sigma = _nx_sigma(G, s)
        delta = {v: 0.0 for v in dist}
        for v in sorted(dist, key=dist.get, reverse=True):
            for u in G.predecessors(v):
                if u in dist and dist[u] + 1 == dist[v]:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
        for v, d in delta.items():
            if v != s:
                want[v] += d
    assert set(out) == set(want)
    for n in want:
        assert abs(out[n] - want[n]) < 1e-9, n


def test_degree_assortativity_vs_networkx(spark):
    """Coefficient matches nx.degree_assortativity_coefficient on the
    undirected simple view of every adversarial shape (skipping
    degree-regular shapes where the correlation is 0/0 on both
    sides)."""
    import math

    from knext_spark.graph import degree_assortativity

    checked = 0
    for gname, pairs in sorted(GRAPHS.items()):
        G = nx.Graph()
        G.add_edges_from((a, b) for a, b in pairs if a != b)
        if G.number_of_edges() == 0:
            continue
        degs = {d for _, d in G.degree()}
        row = degree_assortativity(_edge_df(spark, pairs)).collect()[0]
        assert row["n_ends"] == 2 * G.number_of_edges(), gname
        if len(degs) == 1:
            # regular graph: 0/0 — IEEE NaN here, nan from nx too
            assert math.isnan(row["assortativity"]), gname
            continue
        want = nx.degree_assortativity_coefficient(G)
        assert abs(row["assortativity"] - want) < 1e-9, (
            gname, row["assortativity"], want,
        )
        checked += 1
    assert checked >= 4


def test_random_walks_deterministic_and_hash_argmin(spark):
    """Walk rows reproduce a pure-Python replay of the md5-argmin
    rule exactly, stop at dangling nodes, and are independent of the
    input partitioning."""
    import hashlib

    from knext_spark.graph import random_walks

    pairs = GRAPHS["erdos"] + [("sink_in", "sink")]  # a dangling stop
    starts = sorted({a for a, _ in pairs})[:5] + ["sink_in"]
    seeds = spark.createDataFrame([(n,) for n in starts], "node string")
    out = random_walks(
        _edge_df(spark, pairs), seeds, length=4, walks_per_start=2
    )
    got = sorted(map(tuple, out.collect()))

    adj: dict[str, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    want = []
    for s in set(starts):
        for w in (0, 1):
            node = s
            want.append((s, w, 0, node))
            for t in range(1, 5):
                nbrs = sorted(adj.get(node, ()))
                if not nbrs:
                    break
                node = min(
                    nbrs,
                    key=lambda u: (
                        hashlib.md5(f"{s}:{w}:{t}:{u}".encode()).hexdigest(),
                        u,
                    ),
                )
                want.append((s, w, t, node))
    assert got == sorted(want)
    again = random_walks(
        _edge_df(spark, pairs).repartition(5), seeds, length=4, walks_per_start=2
    )
    assert sorted(map(tuple, again.collect())) == got


@pytest.mark.parametrize("gname", ["chain", "islands", "erdos", "hub"])
def test_pseudo_diameter_vs_networkx(spark, gname):
    """Double sweep: each sweep's ecc equals nx.eccentricity of its
    source (within the start component, undirected), the second sweep
    starts at the first's farthest node, and max(ecc) lower-bounds the
    true diameter (exactly on trees: the chain)."""
    import networkx as nx

    from knext_spark.graph import pseudo_diameter

    pairs = GRAPHS[gname]
    out = pseudo_diameter(_edge_df(spark, pairs), sweeps=2).collect()
    G = nx.Graph()
    G.add_edges_from(pairs)
    start = min(G.nodes)
    comp = G.subgraph(nx.node_connected_component(G, start))
    rows = sorted(out, key=lambda r: r["sweep"])
    assert rows[0]["source"] == start
    assert rows[1]["source"] == rows[0]["farthest"]
    for r in rows:
        assert r["ecc"] == nx.eccentricity(comp, r["source"])
    pd = max(r["ecc"] for r in rows)
    assert pd <= nx.diameter(comp)
    if gname == "chain":
        assert pd == nx.diameter(comp)


def test_pseudo_diameter_rejects_bad_sweeps(spark):
    import pytest as _pytest

    from knext_spark.graph import pseudo_diameter

    df = _edge_df(spark, [("a", "b")])
    with _pytest.raises(ValueError):
        pseudo_diameter(df, sweeps=0)


def _nx_truss_edges(pairs, k):
    G = nx.Graph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    T = nx.k_truss(G, k)
    want = {}
    for u, v in T.edges():
        a, b = min(u, v), max(u, v)
        want[(a, b)] = len(set(T[u]) & set(T[v]))
    return want


def test_k_truss_vs_networkx(spark, corpus_edges):
    """Exact k-truss parity with nx.k_truss: same canonical edge set
    AND the same within-truss support per edge, on the corpus graph,
    the random graph, and a hand shape (two cliques sharing an edge +
    a pendant triangle chain — the cascade case where dropping one
    edge breaks another's triangles)."""
    from knext_spark.graph import k_truss

    for pairs, ks in ((corpus_edges, (3,)), (GRAPHS["erdos"], (3, 4))):
        for k in ks:
            got = {
                (r["a"], r["b"]): r["support"]
                for r in k_truss(_edge_df(spark, pairs), k=k).collect()
            }
            assert got == _nx_truss_edges(pairs, k)
    # hand shape: K4 on a1..a4 glued to a triangle (a1, a2, t1), plus a
    # chain of triangles t1-t2-t3 hanging off it. k=4 keeps only the K4
    # (each K4 edge closes 2 triangles); the glued + chained triangles
    # cascade away.
    import itertools

    k4 = list(itertools.combinations(["a1", "a2", "a3", "a4"], 2))
    glue = [("a1", "t1"), ("a2", "t1")]
    chain = [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    pairs = k4 + glue + chain
    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(_edge_df(spark, pairs), k=4).collect()
    }
    assert got == _nx_truss_edges(pairs, 4)
    assert set(got) == {tuple(sorted(e)) for e in k4}
    # k=2: the whole simple graph survives (threshold 0)
    got2 = {
        (r["a"], r["b"]) for r in k_truss(_edge_df(spark, pairs), k=2).collect()
    }
    assert got2 == {tuple(sorted(e)) for e in pairs}


def test_k_truss_rejects_k_below_two(spark):
    import pytest as _pytest

    from knext_spark.graph import k_truss

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError, match="k >= 2"):
        k_truss(e, k=1)


def test_k_truss_resume_identical(spark, tmp_path):
    """Kill-at-round-1 resume for truss peeling: interrupted + resumed
    equals an uninterrupted run edge-for-edge and support-for-support."""
    from knext_spark.graph import k_truss_run

    import itertools

    k4 = list(itertools.combinations(["a1", "a2", "a3", "a4"], 2))
    pairs = k4 + [("a1", "t1"), ("a2", "t1"), ("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    full = k_truss_run(spark, df, k=4, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    assert any(m.get("peeled", 0) > 0 for m in full.metrics)
    killed = k_truss_run(
        spark, df, k=4, checkpoint_dir=str(tmp_path / "p"), max_iter=1
    )
    assert not killed.converged
    resumed = k_truss_run(
        spark, df, k=4, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    want = sorted(map(tuple, full.state.collect()))
    assert sorted(map(tuple, resumed.state.collect())) == want


def _n2v_replay(pairs, start_nodes, length, walks_per_start, wr, wc, wf):
    """Pure-python replay of node2vec_walks' md5-ticket construction."""
    import hashlib
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    rows = []
    for s in sorted(set(start_nodes)):
        for w in range(walks_per_start):
            cur, prev = s, None
            rows.append((s, w, 0, cur))
            for t in range(1, length + 1):
                cands = adj.get(cur, ())
                if not cands:
                    break
                best = None
                for dst in cands:
                    if prev is None:
                        wt = 1
                    elif dst == prev:
                        wt = wr
                    elif dst in adj.get(prev, ()):
                        wt = wc
                    else:
                        wt = wf
                    for tk in range(1, wt + 1):
                        h = hashlib.md5(
                            f"{s}:{w}:{t}:{dst}:{tk}".encode()
                        ).hexdigest()
                        k = (h, dst)
                        if best is None or k < best:
                            best = k
                if best is None:
                    break
                prev, cur = cur, best[1]
                rows.append((s, w, t, cur))
    return sorted(rows)


def test_node2vec_walks_match_python_replay(spark):
    """Exact md5-ticket replay on a graph exercising every weight
    class (return, triangle-closing, far) plus a dangling stop."""
    from knext_spark.graph import node2vec_walks

    pairs = [
        ("p", "c"), ("c", "p"), ("c", "a"), ("c", "b"),
        ("p", "a"), ("a", "d"), ("b", "e"),
    ]
    starts = spark.createDataFrame([("p",), ("b",)], "node string")
    got = sorted(
        map(
            tuple,
            node2vec_walks(
                _edge_df(spark, pairs), starts, length=4,
                walks_per_start=3, w_return=1, w_common=4, w_far=2,
            ).collect(),
        )
    )
    assert got == _n2v_replay(pairs, ["p", "b"], 4, 3, 1, 4, 2)


def test_node2vec_bias_frequencies(spark):
    """Statistical check of the ticket construction: from p -> c, the
    step-2 choice among {p (return, w=1), a (triangle, w=4),
    b (far, w=2)} lands near the 1:4:2 weights over many walks."""
    from collections import Counter

    from knext_spark.graph import node2vec_walks

    pairs = [("p", "c"), ("c", "p"), ("c", "a"), ("c", "b"), ("p", "a")]
    starts = spark.createDataFrame([("p",)], "node string")
    out = node2vec_walks(
        _edge_df(spark, pairs), starts, length=2,
        walks_per_start=1400, w_return=1, w_common=4, w_far=2,
    ).collect()
    pos = {}
    for r in out:
        pos.setdefault(r["walk"], {})[r["step"]] = r["node"]
    # condition on walks whose (uniform) first step went to c — the
    # p -> a walks die at a and exercise the dangling stop instead
    step2 = Counter(
        p[2] for p in pos.values() if p.get(1) == "c" and 2 in p
    )
    n = sum(step2.values())
    assert n > 400
    for node, w in (("p", 1), ("a", 4), ("b", 2)):
        assert abs(step2[node] / n - w / 7) < 0.06, (node, step2)
    # degenerate weights: all-equal reduces to a uniform walk
    import pytest as _pytest

    with _pytest.raises(ValueError):
        node2vec_walks(_edge_df(spark, pairs), starts, w_return=0)


def test_k_truss_truncated_run_refreshes_supports(spark, tmp_path):
    """A max_iter-truncated run must still report supports counted
    within the SURVIVING edge set, not the pre-peel one."""
    import itertools

    from knext_spark.graph import k_truss_run

    k4 = list(itertools.combinations(["a1", "a2", "a3", "a4"], 2))
    pairs = k4 + [("a1", "t1"), ("a2", "t1"), ("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    res = k_truss_run(spark, df, k=4, checkpoint_dir=str(tmp_path), max_iter=1)
    assert not res.converged
    got = {(r["a"], r["b"]): r["support"] for r in res.state.collect()}
    # python recount on the surviving set
    adj = {}
    for a, b in got:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for (a, b), s in got.items():
        assert s == len(adj[a] & adj[b]), (a, b, s)


def test_pseudo_diameter_rejects_unknown_start(spark):
    import pytest as _pytest

    from knext_spark.graph import pseudo_diameter

    df = _edge_df(spark, [("a", "b"), ("b", "c")])
    with _pytest.raises(ValueError, match="not a node"):
        pseudo_diameter(df, start="zz")
    # a valid hand-picked start still works
    rows = pseudo_diameter(df, start="c").collect()
    assert rows[0]["source"] == "c" and rows[0]["ecc"] == 2


# ------------------------------------------------------------ MIS / coloring
def _peel_replay(pairs, dominate):
    """Pure-python replay of graph/mis.py's priority peeling: the exact
    md5-ticket priority, local-minima winners, optional domination."""
    import hashlib

    def prio(x):
        s = str(x)
        return hashlib.md5(f"mis:{s}".encode()).hexdigest() + ":" + s

    sym = set()
    for u, v in pairs:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    active = {u for u, _ in sym}
    es = set(sym)
    decided = {}
    rnd = 0
    while active:
        nb = {}
        for u, v in es:
            nb.setdefault(u, set()).add(v)
        win = {u for u in active if all(prio(u) < prio(v) for v in nb.get(u, ()))}
        assert win, "peeling must progress every round"
        for u in win:
            decided[u] = rnd
        removed = win | (
            {v for u in win for v in nb.get(u, ())} if dominate else set()
        )
        active -= removed
        es = {(u, v) for u, v in es if u in active and v in active}
        rnd += 1
    return decided, sym


def _mis_pairs(seed=7, n=300, m=600):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((str(u), str(v)))
    return sorted(pairs)


def test_mis_matches_python_replay_and_is_maximal(spark):
    from knext_spark.graph import mis

    pairs = _mis_pairs()
    expected, sym = _peel_replay(pairs, dominate=True)
    got = {(r["node"], r["round"]) for r in mis(_edge_df(spark, pairs)).collect()}
    assert got == set(expected.items())
    members = {n for n, _ in got}
    # independent: no internal edge
    assert not any(v in members for u, v in sym if u in members)
    # maximal: every non-member has a member neighbor
    nb = {}
    for u, v in sym:
        nb.setdefault(u, set()).add(v)
    assert all(nb[u] & members for u in nb if u not in members)


def test_coloring_matches_python_replay_and_is_proper(spark):
    from knext_spark.graph import coloring

    pairs = _mis_pairs(seed=11)
    expected, sym = _peel_replay(pairs, dominate=False)
    got = {
        (r["node"], r["color"]) for r in coloring(_edge_df(spark, pairs)).collect()
    }
    assert got == set(expected.items())
    colors = dict(got)
    assert all(colors[u] != colors[v] for u, v in sym)


def test_mis_dense_graph_few_rounds(spark):
    """Luby domination keeps the round count O(log V) even on a dense
    graph (where the coloring peel would need ~V rounds): a 60-node
    random graph at edge density ~0.5 must finish in < 8 rounds and
    still replay exactly."""
    from knext_spark.graph import mis_run

    rng = random.Random(3)
    pairs = sorted(
        (str(u), str(v))
        for u in range(60)
        for v in range(60)
        if u < v and rng.random() < 0.5
    )
    expected, _ = _peel_replay(pairs, dominate=True)
    res = mis_run(spark, _edge_df(spark, pairs))
    assert res.converged
    assert res.iterations < 8
    got = {(r["node"], r["round"]) for r in res.state.collect()}
    assert got == set(expected.items())


def test_mis_resume_identical(spark, tmp_path):
    """Kill-at-round-1 resume for the MIS peel: interrupted + resumed
    equals an uninterrupted run member-for-member, round-for-round."""
    from knext_spark.graph import mis_run

    df = _edge_df(spark, _mis_pairs(seed=19, n=120, m=260))
    full = mis_run(spark, df, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    assert any(m.get("decided", 0) > 0 for m in full.metrics)
    killed = mis_run(spark, df, checkpoint_dir=str(tmp_path / "p"), max_iter=1)
    assert not killed.converged
    resumed = mis_run(
        spark, df, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    want = sorted(map(tuple, full.state.collect()))
    assert sorted(map(tuple, resumed.state.collect())) == want


def test_coloring_resume_identical(spark, tmp_path):
    from knext_spark.graph import coloring_run

    df = _edge_df(spark, _mis_pairs(seed=23, n=120, m=260))
    full = coloring_run(spark, df, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    killed = coloring_run(
        spark, df, checkpoint_dir=str(tmp_path / "p"), max_iter=1
    )
    assert not killed.converged
    resumed = coloring_run(
        spark, df, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    assert resumed.iterations == full.iterations
    want = sorted(map(tuple, full.state.collect()))
    assert sorted(map(tuple, resumed.state.collect())) == want


# ------------------------------------------------------------ ANF / HyperBall
def _anf_replay(pairs, hops, k_hex=3):
    """Pure-python replay: exact BFS balls + the engine's exact
    register/rho derivation (pipeline/sketch.py, salt 'anf')."""
    import hashlib

    sym = {}
    for u, v in pairs:
        if u != v:
            sym.setdefault(u, set()).add(v)
            sym.setdefault(v, set()).add(u)

    def reg_rho(x):
        hx = hashlib.md5(f"anf:{x}".encode()).hexdigest()
        reg, suf = hx[:k_hex], hx[k_hex : k_hex + 12]
        z = len(suf) - len(suf.lstrip("0"))
        if z == 12:
            return reg, 49
        c = suf[z]
        extra = 0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3
        return reg, 4 * z + extra + 1

    balls, regs = {}, {}
    for v in sym:
        cur = {v}
        for _ in range(hops):
            cur = cur | {w for x in cur for w in sym.get(x, ())}
        balls[v] = cur
        r = {}
        for w in cur:
            k, rho = reg_rho(w)
            r[k] = max(r.get(k, 0), rho)
        regs[v] = r
    return balls, regs


def test_anf_registers_match_replay_and_estimates_track_truth(spark):
    from knext_spark.graph import anf

    pairs = _mis_pairs(seed=31, n=200, m=320)
    balls, regs = _anf_replay(pairs, hops=3)
    rows = anf(_edge_df(spark, pairs), hops=3).collect()
    assert len(rows) == len(balls)
    for r in rows:
        v = r["node"]
        # register-count equality pins the merged sketch exactly
        assert r["n_registers"] == len(regs[v]), v
        true = len(balls[v])
        # m=4096 on balls of tens of nodes sits in the near-exact
        # linear-counting regime; 10% is a loose ceiling
        assert abs(r["estimate"] - true) / true < 0.10, (v, r["estimate"], true)


def test_anf_hops_zero_is_singleton_ball(spark):
    from knext_spark.graph import anf

    pairs = [("a", "b"), ("b", "c")]
    rows = anf(_edge_df(spark, pairs), hops=0).collect()
    assert len(rows) == 3
    assert all(r["n_registers"] == 1 for r in rows)
    assert all(abs(r["estimate"] - 1.0) < 0.01 for r in rows)


def test_anf_rejects_negative_hops(spark):
    import pytest as _pytest

    from knext_spark.graph import anf

    with _pytest.raises(ValueError, match="hops"):
        anf(_edge_df(spark, [("a", "b")]), hops=-1)


def test_anf_resume_identical(spark, tmp_path):
    """Kill-after-round-1 resume for the register merge: interrupted +
    resumed equals an uninterrupted 3-hop run estimate-for-estimate."""
    from knext_spark.graph import anf_run

    df = _edge_df(spark, _mis_pairs(seed=37, n=120, m=200))
    full = anf_run(spark, df, hops=3, checkpoint_dir=str(tmp_path / "f"))
    assert full.converged
    killed = anf_run(spark, df, hops=1, checkpoint_dir=str(tmp_path / "p"))
    resumed = anf_run(
        spark, df, hops=3, checkpoint_dir=str(tmp_path / "p"), resume=True
    )
    assert resumed.converged
    want = sorted(map(tuple, full.state.collect()))
    assert sorted(map(tuple, resumed.state.collect())) == want
