"""Shared superstep runner: checkpoint, resume, lineage metrics.

The north rule requires that "every superstep checkpoints per-partition
lineage and convergence metrics so a killed job resumes mid-iteration".
Design:

- superstep state is a DataFrame; after each superstep the runner
  writes it as Parquet under
  ``<checkpoint_dir>/<algo>/<run_id>/iter=<k>/`` (atomic: Spark's
  ``_SUCCESS`` marker commits the iteration) and reads it back — the
  read-back also truncates Catalyst lineage, keeping plan depth O(1)
  across arbitrarily many supersteps (without it the iterative-join
  plan grows linearly and the driver OOMs on plan analysis long before
  data is the bottleneck).
- alongside the data the runner writes ``_metrics.json``: superstep
  number, wall seconds, row count, the algorithm's convergence metric,
  and per-partition lineage (rows per shuffle partition via
  ``spark_partition_id()``), so an operator can audit skew drift
  between supersteps.
- ``resume=True`` scans for the highest committed iteration
  (``_SUCCESS`` present AND ``_metrics.json`` present) and restarts the
  loop from there; a half-written iteration (killed mid-write) has no
  ``_SUCCESS`` and is ignored, then overwritten.

At cluster scale the checkpoint dir lives on the shared FS (HDFS/S3);
in this sandbox it is a local path. Cadence is 1 (every superstep) per
the north rule; ``cadence=k`` trades resumability granularity for I/O,
using ``localCheckpoint`` (executor-memory lineage truncation, not
fault-tolerant) for intermediate supersteps.

CADENCE > 1 HAZARD — inherited-statistics blowup (Spark 4, found
round 5): ``Dataset.checkpoint``/``localCheckpoint`` copies the origin
plan's estimated statistics onto the resulting LogicalRDD
(``LogicalRDD.rewriteStatsAndConstraints``), and a join's
``sizeInBytes`` is the PRODUCT of its children's. A superstep whose
new state joins k state-derived frames therefore raises the inherited
sizeInBytes to the k-th power per lazily-chained superstep — the
BigInt's DIGIT COUNT grows geometrically and the driver eventually
dies inside ``BigInteger.multiply`` (reproduced: a 3-edge graph OOMs a
1 GB driver in ~25 chained supersteps). Parquet commits reset stats
from real file sizes, so cadence=1 is always safe. Per algorithm:

- pagerank, hits: state multiplies by a CONSTANT per step (edges ×
  state once for pagerank; hits' state update was restructured to
  union+sum, whose stats ADD — see graph/hits.py) — digit growth
  linear, any cadence safe;
- lpa (labels ⋈ best(labels)): digit count DOUBLES per lazy step —
  safe to roughly a dozen chained supersteps (default cadence=1);
- cc (two star passes, each state ⋈ min(state)): digit count ×4 per
  lazy step — keep cadence small (CC converges in O(log V) rounds;
  bench's cadence=10 over ≤7 rounds reaches ~10^5-digit BigInts,
  measured fine but near the useful ceiling);
- k_core (state ⋈ degrees(state) twice): like cc; default cadence=1.

CADENCE > 1 HAZARD #2 — lazy-chain recompute (round 5, measured). The
contract note in run() says step() must have materialized new_state on
non-commit rounds (lazy localCheckpoint + its own action). Steps whose
per-round action touches only a SIDE frame — BFS counts the new
frontier, k-core/k-truss count the peel set — leave the chained state
itself un-materialized, so every later round re-executes ALL prior
rounds' joins through the chain: measured 3x slower at cadence 4 for a
13-round k-core peel (26.6 s vs 8.8 s) and a >10x blowup for a
~32-round BFS (killed at 10 min vs 60 s). pagerank/hits/cc/lpa are
immune (their convergence collect acts on the new state). BFS, k-core
and k-truss therefore default (or pin) cadence=1; raise it only with a
step that checkpoints-and-acts on the state itself.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def auto_num_partitions(
    spark: SparkSession,
    n_nodes: int,
    edges: DataFrame | None = None,
    node_target: int = 4096,
    edge_target: int = 65536,
    floor: int = 2,
) -> int:
    """Scale-adaptive superstep partition count, floored at ``floor``
    and capped at defaultParallelism — the cap IS the previous fixed
    default, so large graphs keep exactly the old full-parallelism
    layout (and the dedicated scaling benches, which pass
    ``num_partitions`` explicitly, are untouched); only small graphs
    stop paying a full-width task wave per superstep stage.

    Width = max(ceil(nodes / node_target), ceil(edges / edge_target)):
    the laid-out frames are EDGE tables, so a dense graph (few nodes,
    many edges) must not collapse onto the node-derived width. The
    edge count costs one narrow scan and is only taken when the
    node-derived width is already below the cap (a graph big enough to
    hit the cap needs no refinement — the scan is skipped exactly when
    it would be the expensive one).

    Measured at the kgml bench graph (14.3k nodes / 36k edges,
    local[32]): pagerank 9.2s -> 5.7s, hits 12.0s -> 7.0s with the
    derived 4 partitions vs the fixed 32 (guide §2: partitioning
    derived from input size, not a constant tuned to either end)."""
    dp = spark.sparkContext.defaultParallelism
    derived = -(-int(n_nodes) // max(1, int(node_target)))
    if derived < dp and edges is not None:
        m = edges.count()
        derived = max(derived, -(-int(m) // max(1, int(edge_target))))
    return max(min(floor, dp), min(dp, derived))


def unpersist_checkpoint(df: DataFrame) -> None:
    """Deterministically free a retired checkpoint layer's blocks.

    ``DataFrame.unpersist`` only clears CacheManager entries; a
    ``localCheckpoint``-ed frame is RDD-level persisted behind a
    LogicalRDD plan node, so its blocks otherwise linger until the
    nondeterministic ContextCleaner pass — which at bench scale means
    gigabytes of dead superstep state inflating GC pressure
    (machine-wide, independent of task parallelism).

    Walks ALL LogicalRDD leaves of the analyzed plan, not just the
    root: algorithms retire projections of their checkpoints (e.g.
    LPA's ``new.select("node", "label")`` analyzes to
    Project(LogicalRDD)), and a root-only match would silently skip
    them — the exact leak this function exists to fix. Only RDDs that
    are actually persisted are freed, so an RDD-backed *input* frame
    (``spark.createDataFrame`` also plans as LogicalRDD, storage level
    NONE) is never touched. Falls back to the plain unpersist for
    CacheManager-backed frames."""
    freed = False
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                r = leaf.rdd()
                lvl = r.getStorageLevel()
                if lvl.useMemory() or lvl.useDisk() or lvl.useOffHeap():
                    r.unpersist(False)
                    freed = True
    except Exception:
        pass
    if not freed:
        df.unpersist()


def _iter_dir(base: str, k: int) -> str:
    return os.path.join(base, f"iter={k:05d}")


def _committed(base: str, k: int) -> bool:
    d = _iter_dir(base, k)
    return os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
        os.path.join(d, "_metrics.json")
    )


def last_committed_iter(base: str) -> int:
    """Highest committed superstep, or -1 if none."""
    if not os.path.isdir(base):
        return -1
    best = -1
    for name in os.listdir(base):
        if name.startswith("iter="):
            k = int(name.split("=", 1)[1])
            if _committed(base, k):
                best = max(best, k)
    return best


class SuperstepRunner:
    def __init__(
        self,
        spark: SparkSession,
        algo: str,
        run_id: str,
        checkpoint_dir: str,
        cadence: int = 1,
        partition_lineage: bool = True,
    ):
        self.spark = spark
        self.base = os.path.join(checkpoint_dir, algo, run_id)
        self.cadence = max(1, cadence)
        self.partition_lineage = partition_lineage
        self.metrics: list[dict] = []

    def _commit(self, state: DataFrame, k: int, extra: dict, wall_s: float) -> DataFrame:
        d = _iter_dir(self.base, k)
        state.write.mode("overwrite").parquet(d)
        persisted = self.spark.read.parquet(d)
        m = {
            "iteration": k,
            "wall_s": round(wall_s, 4),
            "rows": persisted.count(),
            **extra,
        }
        if self.partition_lineage:
            per_part = (
                persisted.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            m["partitions"] = {str(r["pid"]): r["count"] for r in per_part}
        with open(os.path.join(d, "_metrics.json"), "w") as f:
            json.dump(m, f)
        self.metrics.append(m)
        return persisted

    def run(
        self,
        init_state: Callable[[], DataFrame],
        step: Callable[[DataFrame, int], tuple[DataFrame, dict]],
        converged: Callable[[dict], bool],
        max_iters: int,
        resume: bool = False,
    ) -> SuperstepResult:
        """Run ``step`` until ``converged(metrics)`` or ``max_iters``.

        ``step(state, k)`` returns (new_state, metrics_dict); the
        metrics dict must contain whatever ``converged`` inspects (e.g.
        ``{"l1_delta": ...}`` or ``{"changed": n}``). Superstep 0 is
        the initial state (committed as iter=0).
        """
        start_k = last_committed_iter(self.base) if resume else -1
        if start_k >= 0:
            state = self.spark.read.parquet(_iter_dir(self.base, start_k))
            with open(os.path.join(_iter_dir(self.base, start_k), "_metrics.json")) as f:
                last_m = json.load(f)
            self.metrics.append(last_m)
            if start_k > 0 and converged(last_m):
                return SuperstepResult(state, start_k, True, self.metrics)
        else:
            t0 = time.time()
            state = self._commit(init_state(), 0, {"init": True}, time.time() - t0)
            start_k = 0

        is_converged = False
        k = start_k
        for k in range(start_k + 1, max_iters + 1):
            t0 = time.time()
            new_state, m = step(state, k)
            step_wall = time.time() - t0
            if k % self.cadence == 0 or converged(m) or k == max_iters:
                state = self._commit(new_state, k, m, step_wall)
                # the Parquet read-back supersedes the step's working
                # frame (its localCheckpoint blocks can never be re-read
                # once the commit is durable) — free it here, because the
                # algorithm's own retire list never sees it again: on
                # commit supersteps `state` is replaced by the read-back,
                # so without this the pre-commit frame leaks for the rest
                # of the run (every step at the default cadence=1)
                unpersist_checkpoint(new_state)
            else:
                # step() is responsible for having materialized
                # new_state (lazy localCheckpoint + its own action)
                state = new_state
                self.metrics.append(
                    {"iteration": k, "wall_s": round(step_wall, 4), **m}
                )
            if converged(m):
                is_converged = True
                break
        return SuperstepResult(state, k, is_converged, self.metrics)
