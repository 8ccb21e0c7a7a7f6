"""spark-submit --py-files packaging smoke test.

The north rule mandates the engine "ships as spark-submit --py-files
modules" (BASELINE.json north_star; reference ships a pip console-script
instead, setup.cfg). This test proves the claim end-to-end rather than by
documentation: it zips ``knext_spark/`` exactly as a user would, copies
``main.py`` into an EMPTY temp directory (so the package is importable
ONLY from the zip shipped via --py-files — main.py's own
sys.path.insert points at the temp dir, which contains no package), and
drives two real verbs through a subprocess spark-submit:

  ingest      -> docs corpus table (parquet)
  parse-mixed -> edge warehouse, JSON row-count on stdout

Both verbs execute vectorized pandas-UDF parse code on executor
threads, so a zip that failed to reach the executors' sys.path would
fail here, not just driver-side imports.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit on PATH or in the pyspark distribution")


def _build_zip(dest_dir: str) -> str:
    """Zip knext_spark/ with package-root layout (knext_spark/...)."""
    zpath = os.path.join(dest_dir, "knext_spark.zip")
    pkg = os.path.join(REPO, "knext_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _run(args: list[str], cwd: str) -> str:
    env = dict(os.environ)
    # the temp cwd must be the ONLY implicit import root: drop any
    # PYTHONPATH that could leak the repo checkout into the driver
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    proc = subprocess.run(
        args, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, (
        f"spark-submit failed ({proc.returncode}):\n"
        f"STDOUT:\n{proc.stdout[-4000:]}\nSTDERR:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in stdout:\n{stdout[-2000:]}")


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    submit = _spark_submit()
    zpath = _build_zip(str(tmp_path))
    shutil.copy(os.path.join(REPO, "main.py"), tmp_path / "main.py")
    assert not (tmp_path / "knext_spark").exists()  # zip is the only source

    table = str(tmp_path / "docs")
    out = str(tmp_path / "edges")
    base = [
        submit,
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        str(tmp_path / "main.py"),
    ]

    rec = _last_json(_run(base + [
        "ingest", "--table", table, "--n-docs", "4", "--scale", "0.5",
    ], cwd=str(tmp_path)))
    assert rec["ingested_rows"] == 4

    rec = _last_json(_run(base + [
        "parse-mixed", "--table", table, "--out", out,
    ], cwd=str(tmp_path)))
    assert rec["mixed"] is True
    assert rec["edges"] > 0
    # warehouse actually landed as parquet (possibly partitioned subdirs)
    found = [
        fn
        for root, _d, files in os.walk(out)
        for fn in files
        if fn.endswith(".parquet")
    ]
    assert found, f"no parquet files under {out}: {list(os.walk(out))}"
