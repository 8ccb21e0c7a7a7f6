"""knext_spark — a PySpark-native link-graph analytics engine.

Built from scratch with the query/data-processing capabilities of the
reference CLI `everest-castaneda/knext` (KGML pathway markup -> edge
lists -> graph analysis), re-expressed Spark-first:

- an Iceberg-shaped corpus table ``docs(repo, path, commit, lang, content)``
  (``corpus/``),
- Catalyst-native XML parsing via ``from_xml`` with an Arrow-batched
  ``mapInPandas`` fallback (``parse/``),
- the knext edge semantics (naming, clique expansion, aggregation,
  compound propagation, ID conversion) as declarative DataFrame plans
  (``knext/``),
- iterative DataFrame-join graph algorithms — PageRank (plain,
  personalized, weighted), connected components (weak and strong),
  label propagation, triangle counting, k-core, HITS, multi-source
  BFS / landmark distances, sampled Brandes betweenness (with exact
  shortest-path counting) — with per-superstep checkpoint/resume,
  plus one-shot clustering coefficient, neighbor-Jaccard /
  Adamic-Adar / resource-allocation / preferential-attachment link
  prediction, Newman modularity scoring, degree assortativity,
  k-truss decomposition, double-sweep pseudo-diameter, topological
  levels with cycle detection (Kahn peeling), deterministic Luby
  maximal independent set and priority-peeling greedy coloring,
  HyperBall-style approximate neighborhood function, and
  deterministic DeepWalk-style random walks (``graph/``),
- large-scale training-data pipeline operators (dedup incl. transitive
  cluster closure, similarity search, text analysis incl. repetition
  scoring, corpus profiling, char-bigram LM quality scoring, PII
  scrubbing, benchmark-contamination screening, deterministic splits
  incl. stratified quotas and temperature mixture sampling, mergeable
  sketches — HyperLogLog distinct counts, count-min frequency
  estimates, Bloom-filter membership, and fixed-bin histogram
  quantiles —, distributed BPE merge learning, concat-and-chunk
  sequence packing, multimodal plumbing,
  temporal joins, sessionization) (``pipeline/``, ``streaming/``).

No per-row Python anywhere in the hot path: plans are built-in
pyspark.sql.functions expressions; the only Python on executors is
Arrow-vectorized (mapInPandas / applyInPandas).
"""

__version__ = "0.1.0"
