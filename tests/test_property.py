"""Property-based spot checks (SURVEY.md §5 item 6).

Hypothesis generates random small digraphs mixing gene and non-gene
(cpd:* / undefined* / path:*) nodes, and the tests assert the
propagation invariants the reference's semantics imply
(/root/reference/src/knext/genes.py:157-218) without fixing any
particular graph shape:

- genes-mode propagation never lets a non-gene endpoint survive;
- every gene-gene input edge survives (dedup only collapses identical
  5-col rows);
- every generated CPp bridge is justified: the pair is connected in the
  input digraph by a path whose intermediate nodes are ALL non-gene
  (this also proves faithful-CPp ⊆ contract-closure — the documented
  relationship between the two propagation variants);
- PageRank on random graphs sums to 1 and matches networkx
  allclose(1e-6);
- the Catalyst `_combinations` higher-order expression reproduces
  itertools.combinations order exactly.

The pandas-level tests run hypothesis at full example counts (no Spark
in the loop); Spark-backed properties cap max_examples to keep the
suite fast.
"""

from __future__ import annotations

import itertools

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knext_spark.knext.propagate import _is_gene, _propagate_pdf

GENES = ["tsa:6247-1", "tsa:6255-2", "hsa:10", "g4", "g5", "eno"]
NONGENES = [
    "cpd:C00385-29",
    "cpd:C13747-30",
    "undefined-16",
    "undefined-9",
    "path:tsa00100-17",
]
NODES = GENES + NONGENES

edges_st = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1,
    max_size=30,
)


def _pdf(edges: list[tuple[str, str]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": "d0",
            "pathway": "tsa00100",
            "entry1": [a for a, _ in edges],
            "entry2": [b for _, b in edges],
            "type": "PPrel",
            "value": "-->",
            "name": "activation",
            "out_seq": range(1, len(edges) + 1),
        }
    )


def _closure_pairs(edges: list[tuple[str, str]]) -> set[tuple[str, str]]:
    """Contract semantics, independently in pure Python: (g, h) iff a
    path g -> n+ -> h exists with every intermediate node non-gene."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    pairs = set()
    for g in nodes:
        if not _is_gene(g):
            continue
        stack = [n for n in adj.get(g, ()) if not _is_gene(n)]
        seen: set[str] = set()
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            for m in adj.get(n, ()):
                if _is_gene(m):
                    pairs.add((g, m))
                else:
                    stack.append(m)
    return pairs


@given(edges_st)
@settings(max_examples=150, deadline=None)
def test_propagate_faithful_invariants(edges):
    out = _propagate_pdf(_pdf(edges))
    # 1. no non-gene endpoint survives genes mode
    assert out["entry1"].map(_is_gene).all()
    assert out["entry2"].map(_is_gene).all()
    # 2. every gene-gene input edge survives (as a (entry1, entry2) pair)
    kept_pairs = set(zip(out["entry1"], out["entry2"]))
    for a, b in edges:
        if _is_gene(a) and _is_gene(b):
            assert (a, b) in kept_pairs
    # 3. every CPp bridge is justified by a non-gene-chain path, i.e.
    #    faithful-CPp ⊆ contract-closure
    closure = _closure_pairs(edges)
    cpp = out[out["type"] == "CPp"]
    for a, b in zip(cpp["entry1"], cpp["entry2"]):
        assert (a, b) in closure, (a, b)


@given(edges_st)
@settings(max_examples=150, deadline=None)
def test_propagate_faithful_deterministic(edges):
    a = _propagate_pdf(_pdf(edges))
    b = _propagate_pdf(_pdf(edges))
    pd.testing.assert_frame_equal(a, b)


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pagerank_random_graphs_match_networkx(spark, edges):
    import tempfile

    import networkx as nx
    # scipy is absent in this sandbox; _pagerank_python is NetworkX's
    # own pure-python power iteration (same convention as
    # tests/test_graph_algos.py)
    from networkx.algorithms.link_analysis.pagerank_alg import (
        _pagerank_python,
    )

    from knext_spark.graph import pagerank

    # nx.DiGraph collapses parallel edges -> dedupe for parity
    dedup = list(
        dict.fromkeys((f"n{a}", f"n{b}") for a, b in edges if a != b)
    )
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in dedup],
        "src string, dst string, weight double",
    )
    res = pagerank(
        spark,
        df,
        checkpoint_dir=tempfile.mkdtemp(prefix="prprop_"),
        cadence=25,
    )
    got = {r["node"]: r["rank"] for r in res.state.collect()}
    assert res.converged
    assert abs(sum(got.values()) - 1.0) < 1e-8
    g = nx.DiGraph()
    g.add_edges_from(dedup)
    want = _pagerank_python(g, alpha=0.85, tol=1e-6, max_iter=100)
    assert set(got) == set(want)
    for n, r in want.items():
        assert abs(got[n] - r) <= 1e-6, (n, got[n], r)


@given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=7))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_combinations_order_matches_itertools(spark, tokens):
    from pyspark.sql import functions as F

    from knext_spark.knext.edges import _combinations

    arr = F.array(*[F.lit(t) for t in tokens]) if tokens else F.array().cast(
        "array<string>"
    )
    [row] = spark.range(1).select(_combinations(arr).alias("c")).collect()
    got = [(p["a"], p["b"]) for p in row["c"]]
    assert got == list(itertools.combinations(tokens, 2))


@given(
    st.lists(
        st.tuples(
            st.sampled_from([f"n{i}" for i in range(12)]),
            st.sampled_from([f"n{i}" for i in range(12)]),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_neighbor_jaccard_invariants_random_graphs(spark, edges):
    """Structural invariants on random digraphs, independent of shape:
    every emitted pair is a non-edge of the simple graph; common <=
    min(deg_a, deg_b); union = deg_a + deg_b - common >= common;
    0 < jaccard <= 1; and the emitted pair set is exactly
    nx.jaccard_coefficient's positive-score non-edges."""
    import networkx as nx

    from knext_spark.graph import neighbor_jaccard

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs],
        "src string, dst string, weight double",
    )
    G = nx.Graph()
    G.add_edges_from(pairs)
    deg = dict(G.degree())
    want = {
        tuple(sorted((u, v)))
        for u, v in nx.non_edges(G)
        if len(set(G[u]) & set(G[v])) >= 1
    }
    rows = neighbor_jaccard(df).collect()
    got = set()
    for r in rows:
        a, b = r["a"], r["b"]
        assert a < b
        assert not G.has_edge(a, b)
        assert 1 <= r["common"] <= min(deg[a], deg[b])
        assert r["union_size"] == deg[a] + deg[b] - r["common"]
        assert 0.0 < r["jaccard"] <= 1.0
        got.add((a, b))
    assert got == want


_PII_FRAGMENTS = [
    "x@y.io", "a.b+c@ex.org", "10.0.0.1", "999.1.2.3", "1.2.3",
    "078-05-1120", "12-34-5678", "+44 7700 900123", "+1 (555) 0123",
    "plain words", "v1.2.3.4", "price +12", "a@b", "3.14",
]


@given(st.lists(st.sampled_from(_PII_FRAGMENTS), min_size=1, max_size=8))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scrub_pii_matches_python_re(spark, frags):
    """Cross-engine regex property: on random fragment concatenations,
    Spark's Java-regex counts equal Python re's (the patterns are
    pinned to the common subset), and the scrubbed text is exactly
    Python's sequential re.sub chain."""
    import re as _re

    from knext_spark.pipeline import scrub_pii
    from knext_spark.pipeline.text import PII_PATTERNS

    text = " ".join(frags)
    [row] = scrub_pii(
        spark.createDataFrame([(0, text)], "doc_id long, text string")
    ).collect()
    expect = text
    for name, pat, token in PII_PATTERNS:
        assert row[f"n_{name}"] == len(_re.findall(pat, text)), (name, text)
        expect = _re.sub(pat, token, expect)
    assert row["text"] == expect, text


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(a != b for a, b in es))
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_path_counts_random_graphs_match_networkx(spark, edges):
    """σ/dist from shortest_path_counts equal an nx-derived DP on
    random digraphs (all nodes as seeds), and Brandes invariants hold:
    σ(s,s)=1 at dist 0; σ(s,v) = Σ σ(s,u) over dist-(d-1)
    predecessors; rows exist exactly for nx-reachable pairs."""
    import networkx as nx

    from knext_spark.graph import shortest_path_counts

    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in edges if a != b)
    nodes = sorted(G.nodes)
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    seeds = spark.createDataFrame([(n,) for n in nodes], "node long")
    got = {
        (r["seed"], r["node"]): (r["dist"], r["sigma"])
        for r in shortest_path_counts(df, seeds, max_iter=50).collect()
    }
    want = {}
    for s in nodes:
        dist = nx.single_source_shortest_path_length(G, s)
        sigma = {v: 0 for v in dist}
        sigma[s] = 1
        for v in sorted(dist, key=dist.get):
            if v == s:
                continue
            for u in G.predecessors(v):
                if u in dist and dist[u] + 1 == dist[v]:
                    sigma[v] += sigma[u]
        for v, d in dist.items():
            want[(s, v)] = (d, sigma[v])
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_topological_levels_random_graphs_match_kahn(spark, edges):
    """Kahn levels from topological_levels equal a pure-python Kahn
    replay on random digraphs (self-loops and parallel edges allowed):
    leveled nodes get the peeling-round index, everything the peeling
    never reaches (on or downstream of a cycle) gets -1."""
    from knext_spark.graph import topological_levels

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["level"] for r in topological_levels(df).collect()}

    succ: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for a, b in edges:
        nodes.update((a, b))
        succ.setdefault(a, set()).add(b)
    indeg = {n: 0 for n in nodes}
    for a, ds in succ.items():
        for d in ds:
            indeg[d] += 1
    want = {}
    cur = sorted(n for n in nodes if indeg[n] == 0)
    lvl = 0
    while cur:
        nxt = set()
        for n in cur:
            want[n] = lvl
            for d in succ.get(n, ()):
                indeg[d] -= 1
                if indeg[d] == 0:
                    nxt.add(d)
        cur = sorted(nxt)
        lvl += 1
    for n in nodes:
        want.setdefault(n, -1)
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abcxyz019", min_size=0, max_size=12),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hll_registers_match_python_on_random_keys(spark, keys):
    """Property: the engine's (register, max rho) table equals a pure-
    python replay of the md5 string construction on arbitrary keys —
    duplicates, empty strings, any order."""
    import hashlib

    from knext_spark.pipeline import hll_registers

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["register"]: r["rho"]
        for r in hll_registers(df, "k", k_hex=2).collect()
    }
    want = {}
    for kk in keys:
        h = hashlib.md5(f"hll:{kk}".encode()).hexdigest()
        reg, suf = h[:2], h[2:14]
        z = len(suf) - len(suf.lstrip("0"))
        if z == 12:
            rho = 49
        else:
            c = suf[z]
            rho = 4 * z + (0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3) + 1
        want[reg] = max(want.get(reg, 0), rho)
    assert got == want


@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60),
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=32),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_histogram_matches_python_on_random_values(spark, vals, lo, span, bins):
    """Property: integer-div binning with edge clamping equals the
    python replay for any values (far outside the range included),
    any bounds, any bin count."""
    from knext_spark.pipeline import histogram

    hi = lo + span
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["bin"]: r["cnt"] for r in histogram(df, "v", lo, hi, bins).collect()}
    want = {}
    for v in vals:
        b = min(max((v - lo) * bins, 0) // span, bins - 1)
        want[b] = want.get(b, 0) + 1
    assert got == want


def _py_merge_spans(hits, w):
    spans = []
    for i in hits:
        if spans and i <= spans[-1][1] + 1:
            spans[-1][1] = max(spans[-1][1], i + w - 1)
        else:
            spans.append([i, i + w - 1])
    return spans


@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12),
        min_size=2,
        max_size=10,
    ),
    st.integers(2, 3),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_operators_match_python_on_random_corpora(spark, docs, w):
    """Property: dup_spans equals the pure-python window/doc-frequency
    /merge replay on any corpus over a binary alphabet (maximal token
    collisions), and contaminated_spans with ref = the corpus's even-
    indexed docs equals the membership replay — including empty docs,
    docs shorter than w, and all-duplicate corpora."""
    from knext_spark.pipeline import contaminated_spans, dup_spans

    corpus = {i + 1: toks for i, toks in enumerate(docs)}
    sh = lambda t, i: " ".join(t[i : i + w])  # noqa: E731

    dfreq: dict[str, set[int]] = {}
    for d, toks in corpus.items():
        for i in range(len(toks) - w + 1):
            dfreq.setdefault(sh(toks, i), set()).add(d)
    want_dup = []
    for d, toks in corpus.items():
        hits = [
            i
            for i in range(len(toks) - w + 1)
            if len(dfreq[sh(toks, i)]) >= 2
        ]
        want_dup += [(d, s, e, e - s + 1) for s, e in _py_merge_spans(hits, w)]

    ref_ids = [d for d in corpus if d % 2 == 0]
    ref_sh = {
        sh(corpus[d], i)
        for d in ref_ids
        for i in range(len(corpus[d]) - w + 1)
    }
    want_con = []
    for d, toks in corpus.items():
        if d in ref_ids:
            continue
        hits = [
            i for i in range(len(toks) - w + 1) if sh(toks, i) in ref_sh
        ]
        want_con += [(d, s, e, e - s + 1) for s, e in _py_merge_spans(hits, w)]

    sdf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], ["doc_id", "text"]
    )
    got_dup = sorted(
        map(tuple, dup_spans(sdf, w=w, min_docs=2).collect())
    )
    assert got_dup == sorted(want_dup)
    train = sdf.where(sdf.doc_id % 2 != 0)
    ref = sdf.where(sdf.doc_id % 2 == 0)
    got_con = sorted(
        map(tuple, contaminated_spans(train, ref, w=w).collect())
    )
    assert got_con == sorted(want_con)
