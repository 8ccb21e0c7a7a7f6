#!/usr/bin/env python3
"""Per-query noop-sink isolation bench (guide §1.4) — bench.py is
FROZEN for the round measurement, so targeted before/after evidence
for individual queries lives here.

Usage:
  python bench_extra.py <query> [<query> ...]

Env:
  SPARK_GRAFT_SF_DIR      data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        core count (default 32)
  SPARK_GRAFT_BENCH_SCALE k-fold deterministic replication via
                          bench._build_scaled_sf (default 1)
  SPARK_GRAFT_BENCH_RUNS  reps per query (default 3, median reported)

Prints one JSON line: {"queries": {name: median_sec}, "spread": {...},
"sf": ..., "bench_scale": k}.  Methodology matches bench.run_suite
(fresh DataFrame per rep, noop sink, setJobDescription labels).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(*names: str) -> int:
    import bench
    import __spark_entry__ as em
    from knext_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    scale = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    except ValueError:
        sf = 0.1  # free-form data dir; sf is informational only here
    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus)
    )
    if scale > 1:
        sf_dir = bench._build_scaled_sf(spark, sf_dir, scale)
    qs = em.queries()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(statistics.median(walls), 3)
        spread[name] = walls
        print(f"# {name}: median {timings[name]}s runs={walls}", flush=True)
    print(json.dumps({
        "queries": timings, "spread": spread, "sf": sf, "bench_scale": scale,
        "cpus": cpus,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
