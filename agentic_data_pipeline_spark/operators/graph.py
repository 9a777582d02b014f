"""Graph analytics over corpus-derived graphs.

Graph-based curation ranks documents by centrality in a similarity graph
(e.g. sampling hubs, down-weighting orphan spam) — the edge list comes
from ext_knn_graph / LSH candidates; this module runs the iterative
algorithms on it. Same distributed-iteration shape as k-means / BPE /
connected components: one big joined aggregate per round + a tiny driver
step, lineage cut per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import op

C = F.col


def pagerank(vertices: DataFrame, edges: DataFrame, damping: float = 0.85,
             iters: int = 10) -> DataFrame:
    """PageRank by power iteration. ``vertices``: one column ``id``;
    ``edges``: ``src``, ``dst`` (directed, unweighted).

    Per round: contributions = edges ⋈ ranks, aggregated per dst — ONE
    shuffle on dst (map-side combined) plus the rank-update join on id;
    out-degree weights are precomputed once. Dangling mass (vertices with
    no out-edges) is a 1-row aggregate redistributed uniformly — the same
    tiny-driver-step pattern as the CC fixpoint / BPE argmax.
    localCheckpoint cuts the per-round lineage. At 100 TB-corpus graph
    sizes the state is two (id, double) tables partitioned on id; rounds
    are fixed-count, so the whole run is `iters` bounded shuffles.
    """
    n = vertices.count()
    w_edges = (edges.join(edges.groupBy("src")
                          .agg(F.count(F.lit(1)).alias("outdeg")), "src")
               .select("src", "dst", (1.0 / C("outdeg")).alias("w"))
               .localCheckpoint())
    has_out = w_edges.select("src").distinct()
    ranks = vertices.select(C("id"), F.lit(1.0 / n).alias("rank")) \
        .localCheckpoint()
    for _ in range(iters):
        dangling = (ranks.join(has_out, C("id") == C("src"), "left_anti")
                    .agg(F.sum("rank")).collect()[0][0] or 0.0)
        contribs = (w_edges.join(ranks, C("src") == C("id"))
                    .groupBy("dst")
                    .agg(F.sum(C("rank") * C("w")).alias("contrib")))
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (vertices.join(contribs, C("id") == C("dst"), "left")
                 .select("id",
                         (F.lit(base)
                          + F.lit(damping) * F.coalesce(C("contrib"),
                                                        F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks


@op("ext_pagerank")  # rows-only: float contributions sum in engine-local
                     # order; pytest pins every rank against a pure-Python
                     # power iteration on the same edge list (1e-9)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the label-blocked kNN similarity graph
    (ext_knn_graph edges, k=3): the corpus-curation signal for hub
    sampling / orphan down-weighting. Vertices = all embedding ids, so
    singleton-block vectors participate as dangling nodes."""
    from ..registry import OPS

    edges = (OPS["ext_knn_graph"].fn(spark, sf_dir)
             .select(C("vec_id").alias("src"), C("neighbor_id").alias("dst")))
    verts = (load_table(spark, sf_dir, "embeddings")
             .select(C("vec_id").alias("id")))
    return (pagerank(verts, edges, damping=0.85, iters=10)
            .select("id", F.round(C("rank"), 9).alias("rank")))
