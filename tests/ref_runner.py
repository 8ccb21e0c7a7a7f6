"""Execute the READ-ONLY reference implementation in-process to produce
golden outputs for parity tests.

This module does not copy reference code — it imports and runs it
(`/root/reference/src`), with a minimal stub for the `typer` dependency
(not installed in this sandbox). Outputs are written to temp dirs and
compared against the engine's results.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

_REF_SRC = "/root/reference/src"


def _stub_typer() -> None:
    if "typer" in sys.modules:
        return
    t = types.ModuleType("typer")
    t.echo = lambda *a, **k: None
    t.style = lambda msg, *a, **k: msg
    t.colors = types.SimpleNamespace(GREEN="green", RED="red")

    class _Typer:
        def __init__(self, *a, **k):
            pass

        def command(self, *a, **k):
            return lambda f: f

    t.Typer = _Typer
    sys.modules["typer"] = t


def reference_available() -> bool:
    return Path(_REF_SRC).is_dir()


def run_reference_genes(
    xml_path: str | Path,
    out_dir: str | Path,
    mixed: bool = False,
    unique: bool = False,
    graphics: bool = False,
) -> Path:
    """Run the reference parser on one KGML file; returns the TSV path.

    Raises the reference's FileNotFound for unparseable docs (caller
    asserts quarantine parity).
    """
    _stub_typer()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    from knext.genes import GenesInteractionParser  # reference, not ours

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    gip = GenesInteractionParser(
        str(xml_path), out_dir, mixed=mixed, unique=unique, graphics=graphics
    )
    gip.genes_file()
    pathway = gip.root.get("name").replace("path:", "")
    return out_dir / f"{pathway}.tsv"


def reference_file_not_found():
    _stub_typer()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    from knext.utils import FileNotFound

    return FileNotFound
