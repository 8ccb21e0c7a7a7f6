"""Iterative DataFrame-join graph algorithms over the canonical edge
table (src, dst, weight[, doc_id]).

The reference (`everest-castaneda/knext`) builds "networks for graph
analysis" (README.rst:5-8) but runs no algorithms itself; the north
rule (/root/repo/BASELINE.json) mandates PageRank, connected
components, label propagation and triangle counting as iterative
DataFrame-join passes with per-superstep checkpointing and explicit
skew handling. All algorithms share the SuperstepRunner (superstep.py)
for checkpoint / resume / per-partition lineage metrics.
"""

from knext_spark.graph.superstep import SuperstepRunner  # noqa: F401
from knext_spark.graph.encode import (  # noqa: F401
    build_dictionary,
    decode_cols,
    encode_edges,
)
from knext_spark.graph.pagerank import pagerank  # noqa: F401
from knext_spark.graph.components import connected_components  # noqa: F401
from knext_spark.graph.lpa import label_propagation  # noqa: F401
from knext_spark.graph.triangles import triangle_count  # noqa: F401
from knext_spark.graph.anf import anf, anf_run  # noqa: F401
from knext_spark.graph.kcore import k_core, k_core_run  # noqa: F401
from knext_spark.graph.mis import (  # noqa: F401
    coloring,
    coloring_run,
    mis,
    mis_run,
)
from knext_spark.graph.ktruss import k_truss, k_truss_run  # noqa: F401
from knext_spark.graph.hits import hits  # noqa: F401
from knext_spark.graph.scc import strongly_connected_components  # noqa: F401
from knext_spark.graph.degrees import (  # noqa: F401
    degrees,
    degree_assortativity,
    degree_histogram,
    roots,
    leaves,
)
from knext_spark.graph.linkpred import (  # noqa: F401
    clustering_coefficient,
    neighbor_jaccard,
)
from knext_spark.graph.betweenness import (  # noqa: F401
    betweenness_sampled,
    shortest_path_counts,
    shortest_path_counts_run,
)
from knext_spark.graph.modularity import (  # noqa: F401
    community_contributions,
    modularity,
)
from knext_spark.graph.walks import node2vec_walks, random_walks  # noqa: F401
from knext_spark.graph.toposort import (  # noqa: F401
    topological_levels,
    topological_levels_run,
)
from knext_spark.graph.bfs import (  # noqa: F401
    bfs_distances,
    bfs_distances_run,
    pseudo_diameter,
)
from knext_spark.graph.landmarks import (  # noqa: F401
    closeness_centrality_sampled,
    harmonic_centrality_sampled,
    landmark_distances,
    landmark_distances_run,
)
