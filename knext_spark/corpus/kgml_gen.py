"""Deterministic synthetic KGML corpus generator.

Offline stand-in for the reference's KEGG REST fetcher
(`/root/reference/src/knext/call.py:13-43`): instead of downloading
pathway XML, we synthesize valid KGML v0.7.2-shaped documents sweeping
every structural feature the reference's parser branches on
(see /root/repo/FIXTURES.md §1):

- entries aliasing multiple genes (space-separated names, e.g. the
  pattern at reference tests/data/hsa00232.xml:123),
- compound entries (``cpd:`` names), ``group`` entries with
  name="undefined" (+ <component> children the reference ignores),
  ``map`` entries (``path:`` names),
- relations with multiple parallel <subtype> children (drives the
  comma-joined aggregation, genes.py:228-234),
- subtype name="compound" whose value is an entry id (drives value
  resolution, genes.py:86-91),
- relations referencing missing entry ids (drives the literal-'nan'
  node path, genes.py:94-99),
- documents with zero relations (drives the FileNotFound guard,
  genes.py:68-71).

Everything is seeded ``random.Random`` — same (seed, params) in, same
bytes out. No wall clock, no entropy.
"""

from __future__ import annotations

import hashlib
import random

_ARROWS = ["-->", "--|", "+p", "---", "..>"]
_SUBTYPE_NAMES = [
    "activation",
    "inhibition",
    "phosphorylation",
    "binding/association",
    "expression",
    "dephosphorylation",
]
_REL_TYPES = ["PPrel", "ECrel", "GErel", "PCrel"]


def gen_kgml_doc(
    org: str,
    number: int,
    rng: random.Random,
    n_genes: int = 12,
    n_compounds: int = 3,
    n_groups: int = 1,
    n_maps: int = 1,
    n_relations: int = 18,
    p_multi_gene: float = 0.3,
    p_compound_subtype: float = 0.25,
    p_parallel_subtype: float = 0.25,
    p_missing_ref: float = 0.05,
    zero_relations: bool = False,
) -> str:
    """Build one KGML document as text. Entry ids are 1-based strings."""
    pathway = f"{org}{number:05d}"
    entries = []  # (id, name, type, x, y, components)
    eid = 0
    gene_ids, cpd_ids, grp_ids, map_ids = [], [], [], []
    gene_counter = rng.randrange(1000, 9000)
    for _ in range(n_genes):
        eid += 1
        k = 1 + (rng.random() < p_multi_gene) * rng.randint(1, 3)
        names = []
        for _ in range(k):
            gene_counter += rng.randint(1, 17)
            names.append(f"{org}:{gene_counter}")
        entries.append((str(eid), " ".join(names), "gene"))
        gene_ids.append(str(eid))
    for _ in range(n_compounds):
        eid += 1
        entries.append((str(eid), f"cpd:C{rng.randrange(10, 99999):05d}", "compound"))
        cpd_ids.append(str(eid))
    for _ in range(n_groups):
        eid += 1
        entries.append((str(eid), "undefined", "group"))
        grp_ids.append(str(eid))
    for _ in range(n_maps):
        eid += 1
        entries.append((str(eid), f"path:{org}{rng.randrange(1, 99999):05d}", "map"))
        map_ids.append(str(eid))

    all_ids = gene_ids + cpd_ids + grp_ids + map_ids
    relations = []
    if not zero_relations:
        for _ in range(n_relations):
            e1 = rng.choice(all_ids)
            e2 = rng.choice(all_ids)
            if rng.random() < p_missing_ref:
                e2 = str(int(all_ids[-1]) + rng.randint(1, 5))  # dangling ref
            rtype = rng.choice(_REL_TYPES)
            subtypes = []
            n_sub = 1 + (rng.random() < p_parallel_subtype)
            for _ in range(n_sub):
                if cpd_ids and rng.random() < p_compound_subtype:
                    subtypes.append(("compound", rng.choice(cpd_ids)))
                else:
                    subtypes.append(
                        (rng.choice(_SUBTYPE_NAMES), rng.choice(_ARROWS))
                    )
            relations.append((e1, e2, rtype, subtypes))

    lines = [
        '<?xml version="1.0"?>',
        '<!DOCTYPE pathway SYSTEM "https://www.kegg.jp/kegg/xml/KGML_v0.7.2_.dtd">',
        f'<pathway name="path:{pathway}" org="{org}" number="{number:05d}"'
        f' title="Synthetic pathway {pathway}"'
        f' image="https://www.kegg.jp/kegg/pathway/{org}/{pathway}.png"'
        f' link="https://www.kegg.jp/kegg-bin/show_pathway?{pathway}">',
    ]
    for i, (id_, name, type_) in enumerate(entries):
        x = 40 + (i * 97) % 900
        y = 40 + (i * 53) % 600
        lines.append(
            f'    <entry id="{id_}" name="{name}" type="{type_}"'
            f' link="https://www.kegg.jp/dbget-bin/www_bget?{name.split()[0]}">'
        )
        gname = name.split()[0]
        gtype = "circle" if type_ == "compound" else "rectangle"
        lines.append(
            f'        <graphics name="{gname}" fgcolor="#000000" bgcolor="#FFFFFF"'
            f' type="{gtype}" x="{x}" y="{y}" width="46" height="17"/>'
        )
        if type_ == "group":  # <component> children — ignored by the reference
            for cid in gene_ids[:2]:
                lines.append(f'        <component id="{cid}"/>')
        lines.append("    </entry>")
    for e1, e2, rtype, subtypes in relations:
        lines.append(f'    <relation entry1="{e1}" entry2="{e2}" type="{rtype}">')
        for sname, sval in subtypes:
            lines.append(f'        <subtype name="{sname}" value="{sval}"/>')
        lines.append("    </relation>")
    lines.append("</pathway>")
    return "\n".join(lines) + "\n"


def _commit_of(repo: str, path: str, seed: int) -> str:
    return hashlib.sha256(f"{repo}\x00{path}\x00{seed}".encode()).hexdigest()[:12]


def gen_docs_df(
    spark,
    n_docs: int,
    seed: int = 42,
    orgs: tuple[str, ...] = ("tsa", "tsb", "tsc"),
    scale: float = 1.0,
):
    """DISTRIBUTED corpus generator: one task per range-partition, each
    generating its slice of documents (per-doc rng seeded by
    (seed, doc index) — deterministic regardless of partitioning).

    This is the 10^12-file design: the driver never holds documents;
    ``spark.range(n).mapInPandas`` fans generation across executors,
    and the same job shape ingests real files at scale (replace the
    generator body with a fetch). Returns docs(repo, path, commit,
    lang, content)."""
    import pandas as pd  # noqa: F401 (executor-side)

    from knext_spark.corpus.table import DOCS_SCHEMA

    n_part = spark.sparkContext.defaultParallelism

    def gen(batches):
        import random as _random

        import pandas as _pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                org = orgs[i % len(orgs)]
                number = 100 + i
                rng = _random.Random(f"{seed}:{i}")
                zero = i % 10 == 7
                content = gen_kgml_doc(
                    org,
                    number,
                    rng,
                    n_genes=max(3, int(12 * scale)),
                    n_compounds=max(1, int(3 * scale)),
                    n_relations=0 if zero else max(4, int(18 * scale)),
                    zero_relations=zero,
                )
                repo = f"kegg/{org}"
                path = f"pathways/{org}{number:07d}.xml"
                rows.append(
                    (repo, path, _commit_of(repo, path, seed), "xml", content)
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in DOCS_SCHEMA.fields]
            )

    return (
        spark.range(n_docs)
        .repartition(n_part)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )


def gen_corpus_rows(
    n_docs: int = 20,
    seed: int = 42,
    orgs: tuple[str, ...] = ("tsa", "tsb", "tsc"),
    include_fixture_path: str | None = "/root/reference/tests/data/hsa00232.xml",
    scale: float = 1.0,
) -> list[tuple[str, str, str, str, str]]:
    """Rows (repo, path, commit, lang, content) for the docs table.

    ``scale`` multiplies per-doc entity/relation counts (bench knob).
    Doc 0 of each org has zero relations (quarantine path); the real
    hsa00232 fixture is appended verbatim when readable.
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        org = orgs[i % len(orgs)]
        number = 100 + i
        zero = i % max(n_docs, 10) == 7  # one quarantine doc per ~10
        content = gen_kgml_doc(
            org,
            number,
            rng,
            n_genes=max(3, int(12 * scale)),
            n_compounds=max(1, int(3 * scale)),
            n_relations=0 if zero else max(4, int(18 * scale)),
            zero_relations=zero,
        )
        repo = f"kegg/{org}"
        path = f"pathways/{org}{number:05d}.xml"
        rows.append((repo, path, _commit_of(repo, path, seed), "xml", content))
    if include_fixture_path:
        try:
            with open(include_fixture_path) as f:
                content = f.read()
            repo, path = "kegg/hsa", "pathways/hsa00232.xml"
            rows.append((repo, path, _commit_of(repo, path, seed), "xml", content))
        except OSError:
            pass
    return rows
