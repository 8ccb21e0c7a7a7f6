"""Display-name enrichment (reference J4/P15, implemented as intended).

The reference's ``names=True`` path is unreachable — `_get_names_dictionary`
returns ``self.names_dictionary`` before assignment and crashes
(`/root/reference/src/knext/genes.py:109-114`; SURVEY.md §8.1). The
*intended* behavior (from `utils.names_dict`, `utils.py:52-112`, and
`_add_names`, `genes.py:239-246`) is: look up each endpoint's
human-readable name (KEGG `find/genes|compound|pathway` REST calls,
keyed by the node name with terminal ``-<id>`` modifiers stripped for
the URL but the FULL node name as dict key) and insert ``entry1_name``
after ``entry1`` and ``entry2_name`` after ``entry2``.

Offline, the REST lookups become a ``names(node, display_name)``
dimension table (synthesized deterministically); enrichment is a
broadcast left join — misses stay null (reference: NaN).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F


def synth_names_rows(nodes: list[str]) -> list[tuple[str, str]]:
    """Deterministic display names, shaped like KEGG's find output:
    genes get 'SYM<digits>; synthetic gene <digits>', compounds
    'Compound <id>', pathways 'Pathway <id>'."""
    out = []
    for n in sorted(set(nodes)):
        base = n.split("-")[0]
        if base.startswith("cpd:"):
            out.append((n, f"Compound {base[4:]}"))
        elif base.startswith("path:"):
            out.append((n, f"Pathway {base[5:]}"))
        elif base.startswith("undefined"):
            continue  # reference: no name lookup for group nodes
        else:
            num = base.split(":", 1)[-1]
            tag = hashlib.sha256(base.encode()).hexdigest()[:4].upper()
            out.append((n, f"{tag}{num}; synthetic gene {num}"))
    return out


def add_names(edges: DataFrame, names: DataFrame) -> DataFrame:
    """Broadcast left-join display names onto the edge frame; column
    order reproduces `_add_names` (`genes.py:243-245`): entry1,
    entry1_name, entry2, entry2_name, <rest>."""
    n1 = F.broadcast(
        names.select(
            F.col("node").alias("entry1"), F.col("display_name").alias("entry1_name")
        )
    )
    n2 = F.broadcast(
        names.select(
            F.col("node").alias("entry2"), F.col("display_name").alias("entry2_name")
        )
    )
    rest = [c for c in edges.columns if c not in ("entry1", "entry2")]
    return (
        edges.join(n1, "entry1", "left")
        .join(n2, "entry2", "left")
        .select("entry1", "entry1_name", "entry2", "entry2_name", *rest)
    )
