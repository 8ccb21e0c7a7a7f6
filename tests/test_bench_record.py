"""Regression guard for the bench record protocol.

Round 3's official BENCH_r03.json came back ``parsed: null`` because the
single headline stdout line, grown by ``queries_spread``, overflowed the
driver's tail capture. ``bench.emit`` now prints the full record early and
a SHORT headline JSON as the LAST stdout line, plus writes the full record
to BENCH_LAST.json. These tests pin that contract without starting Spark.
"""

import importlib.util
import io
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    # Import bench.py as a module without triggering __main__.
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_record():
    # Shaped like a real headline-suite record, with bulky diagnostics.
    return {
        "metric": "headline_suite_wall",
        "value": 73.5,
        "unit": "sec",
        "queries": {f"q{i:02d}": float(i) for i in range(19)},
        "queries_spread": {
            f"q{i:02d}": {"runs": [float(i)] * 3, "min": float(i), "max": float(i)}
            for i in range(19)
        },
        "levels": {
            "local[8]": {"per_superstep_walls": [[1.0] * 16 for _ in range(3)]}
        },
        "sf": 0.1,
        "cpus": 32,
    }


def test_last_stdout_line_is_short_standalone_json(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.emit(_fake_record())
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    last = lines[-1]
    parsed = json.loads(last)  # must parse standalone
    # Bulky diagnostic arrays are stripped everywhere, including nested.
    assert "queries_spread" not in parsed
    assert "per_superstep_walls" not in parsed.get("levels", {}).get("local[8]", {})
    # Headline payload survives.
    assert parsed["metric"] == "headline_suite_wall"
    assert len(parsed["queries"]) == 19
    # Short enough for any sane tail capture even with many queries.
    assert len(last) < 4096, "final line must stay well inside tail-capture windows"


def test_full_record_written_to_bench_last_json(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(sys, "stdout", io.StringIO())
    rec = _fake_record()
    bench.emit(rec)
    with open(tmp_path / "BENCH_LAST.json") as f:
        on_disk = json.load(f)
    assert on_disk == rec  # spread arrays preserved in the file record
