"""Parse-layer tests: native from_xml vs Arrow fallback, corpus table
round-trip, content sha256 invariant (BASELINE.json input_hint), and
the reference's own test assertions re-expressed offline
(reference tests/test_graph.py:14-50, tests/test_get_kgml.py:14-22)."""

import hashlib

from pyspark.sql import functions as F

from knext_spark.corpus import docs_from_rows, gen_corpus_rows, read_docs, write_docs
from knext_spark.parse import parse_docs


def test_parse_native_counts(parsed_docs):
    # fixture hsa00232.xml: 50 entries, 10 relation-subtype rows
    row = parsed_docs.where(F.col("pathway") == "hsa00232").first()
    assert row is not None
    assert len(row["entries"]) == 50
    assert sum(len(r["subtypes"]) for r in row["relations"]) == 10
    assert row["org"] == "hsa"
    assert row["title"] == "Caffeine metabolism"


def test_parse_engines_agree(spark, corpus_rows):
    docs = docs_from_rows(spark, corpus_rows)
    a = parse_docs(docs, engine="native").orderBy("doc_id").collect()
    b = parse_docs(docs, engine="arrow").orderBy("doc_id").collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb


def test_raw_edges_nonempty(parsed_docs):
    # reference tests/test_graph.py asserts the raw relation x subtype
    # parse yields edges for the fixture
    from knext_spark.knext.edges import expanded_pairs

    n = (
        expanded_pairs(parsed_docs)
        .where(F.col("pathway") == "hsa00232")
        .count()
    )
    assert n > 0


def test_fixture_pathway_attr(parsed_docs):
    # offline analogue of reference tests/test_get_kgml.py: the stored
    # fixture's pathway name attribute round-trips through the corpus
    row = parsed_docs.where(F.col("pathway") == "hsa00232").first()
    assert row["pathway"] == "hsa00232"


def test_content_sha256_invariant(spark, corpus_rows):
    # per-row invariant vs the source XML text (BASELINE.json input_hint)
    docs = docs_from_rows(spark, corpus_rows)
    got = {
        r["path"]: r["h"]
        for r in docs.select("path", F.sha2("content", 256).alias("h")).collect()
    }
    for repo, path, commit, lang, content in corpus_rows:
        assert got[path] == hashlib.sha256(content.encode()).hexdigest()


def test_docs_table_roundtrip_and_idempotent(spark, corpus_rows, tmp_path):
    table = str(tmp_path / "docs_table")
    docs = docs_from_rows(spark, corpus_rows)
    n1 = write_docs(docs, table, n_buckets=8)
    assert n1 == len(corpus_rows)
    back = read_docs(spark, table)
    assert back.count() == len(corpus_rows)
    assert [f.name for f in back.schema.fields] == [
        "repo",
        "path",
        "commit",
        "lang",
        "content",
    ]
    # idempotent re-ingest adds nothing (reference skips existing files,
    # call.py:38-39)
    n2 = write_docs(docs, table, idempotent=True, n_buckets=8)
    assert n2 == 0
    assert read_docs(spark, table).count() == len(corpus_rows)


def test_quarantine(parsed_docs, corpus_rows):
    from knext_spark.knext import quarantine_docs

    q = quarantine_docs(parsed_docs).collect()
    # generator plants one zero-relation doc per ~10 (kgml_gen: i%10==7)
    assert len(q) >= 1
    for r in q:
        assert "cannot be parsed" in r["error"]


def _with_malformed(corpus_rows):
    rows = list(corpus_rows)
    rows.append(
        ("repoX", "kgml/broken.xml", "deadbeef", "xml", "<pathway><unclosed")
    )
    return rows


def test_quarantine_malformed_both_engines(spark, corpus_rows):
    """A syntactically malformed document must surface as a quarantined
    row (null parsed fields) on BOTH parse engines — round-1 finding:
    the Arrow fallback silently dropped it (reference parity:
    /root/reference/src/knext/genes.py:328-330 skips-with-error, it
    never vanishes a file)."""
    import pytest
    from knext_spark.knext import quarantine_docs

    rows = _with_malformed(corpus_rows)
    docs = docs_from_rows(spark, rows)
    for engine in ("native", "arrow"):
        parsed = parse_docs(docs, engine=engine)
        assert parsed.count() == len(rows), engine  # nothing vanishes
        q = {r["path"] for r in quarantine_docs(parsed).collect()}
        assert "kgml/broken.xml" in q, engine
