"""Rehearse the driver's correctness gate: run EVERY __spark_entry__
queries() row against its oracle_sql() at an arbitrary SF dir and
report mismatches — the same side-by-side the driver performs at
sf0.01, runnable on demand before a round closes.

Usage: python tools/gate_rehearsal.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from knext_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark("gate_rehearsal", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    bad: list[str] = []
    for name, fn in qs.items():
        try:
            srows = sorted(map(tuple, fn(spark, sf_dir).collect()))
            if name not in oracles:
                print(f"ROW {name}: rows={len(srows)} (no_oracle)", flush=True)
                continue
            orows = sorted(map(tuple, con.execute(oracles[name]).fetchall()))
            ok = srows == orows
            print(f"ROW {name}: rows={len(srows)}/{len(orows)} equal={ok}", flush=True)
            if not ok:
                bad.append(name)
        except Exception as ex:  # keep going; report at the end
            print(f"ROW {name}: ERROR {ex}", flush=True)
            bad.append(name)
    print("SUMMARY bad:", bad, flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
