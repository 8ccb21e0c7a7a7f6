"""KGML (KEGG pathway XML) parsing into a structured DataFrame.

The reference parses one file at a time with ElementTree
(`/root/reference/src/knext/genes.py:37-38`) and reads: pathway attrs
(name/org/title/link), entry attrs id/name/type + child <graphics> x/y
(`utils.py:114-138,37-50`), and relation attrs entry1/entry2/type +
child <subtype> name/value (`genes.py:52-57`). <reaction> elements and
<component> children are never read — the schema below prunes them, so
Catalyst's column pruning drops them at scan time.

Engine primary path: PySpark 4 native ``from_xml`` — pure JVM, no
Python on executors. Fallback (``engine='arrow'``): an Arrow-batched
``mapInPandas`` ElementTree parser — still zero per-row Python in the
plan (one Python invocation per ~10k-row Arrow batch).

Output: one row per document —
  (doc_id, repo, path, commit, pathway, org, title, link,
   entries: array<struct<id,name,type,x,y>>,
   relations: array<struct<entry1,entry2,rtype,
                           subtypes: array<struct<name,value>>>>)

Array order preserves XML document order (load-bearing: the reference's
output row ordering derives from it).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

# --- nested XML schema (attribute prefix "_" is from_xml's default) ---
_GRAPHICS_T = T.StructType(
    [T.StructField("_x", T.IntegerType()), T.StructField("_y", T.IntegerType())]
)
_ENTRY_T = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("_name", T.StringType()),
        T.StructField("_type", T.StringType()),
        T.StructField("graphics", _GRAPHICS_T),
    ]
)
_SUBTYPE_T = T.StructType(
    [T.StructField("_name", T.StringType()), T.StructField("_value", T.StringType())]
)
_RELATION_T = T.StructType(
    [
        T.StructField("_entry1", T.StringType()),
        T.StructField("_entry2", T.StringType()),
        T.StructField("_type", T.StringType()),
        T.StructField("subtype", T.ArrayType(_SUBTYPE_T)),
    ]
)
KGML_SCHEMA = T.StructType(
    [
        T.StructField("_name", T.StringType()),
        T.StructField("_org", T.StringType()),
        T.StructField("_title", T.StringType()),
        T.StructField("_link", T.StringType()),
        T.StructField("entry", T.ArrayType(_ENTRY_T)),
        T.StructField("relation", T.ArrayType(_RELATION_T)),
    ]
)

# public (clean-named) parsed schema
ENTRY_OUT_T = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
    ]
)
RELATION_OUT_T = T.StructType(
    [
        T.StructField("entry1", T.StringType()),
        T.StructField("entry2", T.StringType()),
        T.StructField("rtype", T.StringType()),
        T.StructField(
            "subtypes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("pathway", T.StringType()),
        T.StructField("org", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("entries", T.ArrayType(ENTRY_OUT_T)),
        T.StructField("relations", T.ArrayType(RELATION_OUT_T)),
    ]
)


def parse_docs(docs: DataFrame, engine: str = "native") -> DataFrame:
    """docs(repo, path, commit, lang, content) -> PARSED_SCHEMA rows.

    doc_id = sha2(repo||path||commit) — stable provenance key.
    ``pathway`` strips the ``path:`` prefix like the reference
    (`genes.py:261`).
    """
    if engine == "native":
        return _parse_native(docs)
    if engine == "arrow":
        return _parse_arrow(docs)
    raise ValueError(f"unknown parse engine: {engine}")


def _doc_id_col():
    return F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)


def _parse_native(docs: DataFrame) -> DataFrame:
    doc = F.from_xml("content", KGML_SCHEMA)
    return docs.select(
        _doc_id_col().alias("doc_id"),
        "repo",
        "path",
        "commit",
        F.regexp_replace(doc["_name"], "^path:", "").alias("pathway"),
        doc["_org"].alias("org"),
        doc["_title"].alias("title"),
        doc["_link"].alias("link"),
        F.transform(
            doc["entry"],
            lambda e: F.struct(
                e["_id"].alias("id"),
                e["_name"].alias("name"),
                e["_type"].alias("type"),
                e["graphics"]["_x"].alias("x"),
                e["graphics"]["_y"].alias("y"),
            ),
        ).alias("entries"),
        F.transform(
            doc["relation"],
            lambda r: F.struct(
                r["_entry1"].alias("entry1"),
                r["_entry2"].alias("entry2"),
                r["_type"].alias("rtype"),
                F.transform(
                    r["subtype"],
                    lambda s: F.struct(
                        s["_name"].alias("name"), s["_value"].alias("value")
                    ),
                ).alias("subtypes"),
            ),
        ).alias("relations"),
    )


def _parse_arrow(docs: DataFrame) -> DataFrame:
    """Arrow-batched ElementTree fallback (semantics identical)."""
    import hashlib

    def parse_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            out = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                doc_id = hashlib.sha256(
                    "\x00".join([repo, path, commit]).encode()
                ).hexdigest()
                try:
                    root = ET.fromstring(content)
                except ET.ParseError:
                    # native from_xml parity: a malformed document
                    # yields a row with null parsed fields (not a
                    # silently vanished doc), so quarantine_docs
                    # catches it on either engine — reference behavior
                    # (/root/reference/src/knext/genes.py:328-330)
                    out.append(
                        (doc_id, repo, path, commit, None, None, None,
                         None, None, None)
                    )
                    continue
                entries = []
                for e in root.findall("entry"):
                    g = e.find("graphics")
                    gx = g.get("x") if g is not None else None
                    gy = g.get("y") if g is not None else None
                    entries.append(
                        (
                            e.get("id"),
                            e.get("name"),
                            e.get("type"),
                            int(gx) if gx is not None else None,
                            int(gy) if gy is not None else None,
                        )
                    )
                relations = [
                    (
                        r.get("entry1"),
                        r.get("entry2"),
                        r.get("type"),
                        [(s.get("name"), s.get("value")) for s in r.findall("subtype")],
                    )
                    for r in root.findall("relation")
                ]
                name = root.get("name") or ""
                out.append(
                    (
                        doc_id,
                        repo,
                        path,
                        commit,
                        name[5:] if name.startswith("path:") else name,
                        root.get("org"),
                        root.get("title"),
                        root.get("link"),
                        entries or None,  # match from_xml: absent -> null
                        relations or None,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in PARSED_SCHEMA.fields])

    return docs.mapInPandas(parse_batches, schema=PARSED_SCHEMA)
