"""Deterministic offline ID-mapping dimension tables.

Stand-in for the reference's live KEGG REST conv fetchers
(`/root/reference/src/knext/utils.py:141-173`): `conv/{org}/ncbi-geneid`
(1:1 — in real KEGG the numeric part of an ``org:N`` gene id IS its
NCBI gene id, which the generator mirrors) and `conv/{org}/uniprot`
(1:N — a gene maps to 1-3 UniProt accessions; synthesized
deterministically from a seeded hash of the gene id).

Output rows: (kegg_id, target_id, target_seq) — ``target_seq`` pins
the in-group order the reference gets from KEGG response order.
"""

from __future__ import annotations

import hashlib


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def ncbi_rows(gene_ids: list[str]) -> list[tuple[str, str, int]]:
    """kegg_id -> ncbi-geneid:<numeric part> (1:1)."""
    out = []
    for g in sorted(set(gene_ids)):
        num = g.split(":", 1)[1] if ":" in g else g
        out.append((g, f"ncbi-geneid:{num}", 0))
    return out


def uniprot_rows(gene_ids: list[str], seed: int = 42) -> list[tuple[str, str, int]]:
    """kegg_id -> 1-3 up:<accession> rows (multimap)."""
    out = []
    for g in sorted(set(gene_ids)):
        h = _h(f"{seed}:{g}")
        n = 1 + h % 3
        for i in range(n):
            acc = f"{'PQO'[i % 3]}{(h // (i + 7)) % 100000:05d}"
            out.append((g, f"up:{acc}", i))
    return out


def gene_ids_of_corpus(parsed_entries) -> list[str]:
    """All gene ids (bare, unsuffixed) appearing in parsed docs' entries:
    pass an iterable of (name, type) tuples."""
    ids: set[str] = set()
    for name, etype in parsed_entries:
        if etype == "gene" and name:
            ids.update(name.split(" "))
    return sorted(ids)


MAPPING_SCHEMA = "kegg_id string, target_id string, target_seq int"
