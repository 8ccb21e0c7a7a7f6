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
- iterative DataFrame-join graph algorithms — PageRank (plain and
  personalized), connected components (weak and strong), label
  propagation, triangle counting, k-core, HITS, multi-source BFS
  distances — with per-superstep checkpoint/resume, plus one-shot
  clustering-coefficient and neighbor-Jaccard/Adamic-Adar link
  prediction (``graph/``),
- large-scale training-data pipeline operators (dedup incl. transitive
  cluster closure, similarity search, text analysis, corpus profiling,
  PII scrubbing, deterministic splits, multimodal plumbing, temporal
  joins, sessionization) (``pipeline/``, ``streaming/``).

No per-row Python anywhere in the hot path: plans are built-in
pyspark.sql.functions expressions; the only Python on executors is
Arrow-vectorized (mapInPandas / applyInPandas).
"""

__version__ = "0.1.0"
