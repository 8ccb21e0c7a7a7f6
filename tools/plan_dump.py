"""Dump .explain("formatted") for named __spark_entry__ queries to
plans/r06/<query>_<tag>.txt (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema — before and
after every change).

Usage: python tools/plan_dump.py <tag> <query> [<query> ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from knext_spark.session import get_spark  # noqa: E402


def main(tag: str, *names: str) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "plan_dump", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus)
    )
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
