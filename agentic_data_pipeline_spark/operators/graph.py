"""Graph analytics over corpus-derived graphs.

Graph-based curation ranks documents by centrality in a similarity graph
(e.g. sampling hubs, down-weighting orphan spam) — the edge list comes
from ext_knn_graph / LSH candidates; this module runs the iterative
algorithms on it. Same distributed-iteration shape as k-means / BPE /
connected components: one big joined aggregate per round, lineage cut per
round — and NO per-round driver sync: the dangling mass rides along as a
1-row broadcast inside the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import op
from .similarity import _KNN_GRAPH_ORACLE

C = F.col


def pagerank(vertices: DataFrame, edges: DataFrame, damping: float = 0.85,
             iters: int = 10) -> DataFrame:
    """PageRank by power iteration. ``vertices``: one column ``id``;
    ``edges``: ``src``, ``dst`` (directed, unweighted).

    Per round: contributions = edges ⋈ ranks, aggregated per dst — ONE
    shuffle on dst (map-side combined) plus the rank-update join on id;
    out-degree weights are precomputed once. Dangling mass (vertices with
    no out-edges) is a 1-row aggregate that CROSS-JOINS (broadcast) into
    the rank update — part of the same distributed plan, zero driver
    round-trips per iteration (the r4 nit: a scalar `.collect()` per
    round cost 10 extra driver-synced jobs for nothing).
    localCheckpoint cuts the per-round lineage. At 100 TB-corpus graph
    sizes the state is two (id, double) tables partitioned on id; rounds
    are fixed-count, so the whole run is `iters` bounded shuffles.
    """
    from pyspark.sql import Window

    n = vertices.count()
    # Out-degree weights via a window over src: ONE pass over the edge
    # subtree and one shuffle. The previous self-join form
    # (edges ⋈ edges.groupBy(src).count) evaluated the edge subtree —
    # here the full BLAS kNN construction — TWICE and paid an extra join
    # (same recompute class as the r6 connected-components fix;
    # interleaved A/B at sf0.1: 3.61 s → 3.16 s, ranks bit-identical).
    w_edges = (edges.select(
        "src", "dst",
        (1.0 / F.count(F.lit(1)).over(Window.partitionBy("src")))
        .alias("w"))
        .localCheckpoint())
    has_out = w_edges.select("src").distinct()
    # Dangling-ness is a property of the GRAPH, not the iteration: resolve
    # it once into a boolean carried on the rank state, so each round's
    # dangling mass is a filter+agg over the checkpointed state instead of
    # a fresh anti-join (one join per iteration saved — measured ~20% off
    # the 10-round sf0.1 wall time), and the update joins the prior state
    # rather than rescanning the vertex table.
    ranks = (vertices
             .join(has_out.select(C("src").alias("id"),
                                  F.lit(True).alias("__has")), "id", "left")
             .select("id", F.lit(1.0 / n).alias("rank"),
                     F.coalesce(C("__has"), F.lit(False)).alias("has_out"))
             .localCheckpoint())
    for _ in range(iters):
        dang = (ranks.filter(~C("has_out"))
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")))
        contribs = (w_edges.join(ranks.select("id", "rank"),
                                 C("src") == C("id"))
                    .groupBy("dst")
                    .agg(F.sum(C("rank") * C("w")).alias("contrib")))
        # base = (1-d)/n + d*dang/n, evaluated in the same left-to-right
        # double arithmetic as the oracle's recursive step.
        base = (F.lit((1.0 - damping) / n)
                + F.lit(damping) * C("__dang") / F.lit(float(n)))
        ranks = (ranks.select("id", "has_out")
                 .join(contribs, C("id") == C("dst"), "left")
                 .crossJoin(F.broadcast(dang))
                 .select("id",
                         (base
                          + F.lit(damping) * F.coalesce(C("contrib"),
                                                        F.lit(0.0)))
                         .alias("rank"),
                         "has_out")
                 .localCheckpoint())
    return ranks.select("id", "rank")


# The oracle replays the SAME fixed-count power iteration as a bounded
# recursive CTE: per step, per-dst contribution sums + the dangling mass,
# exactly the op's update rule. Edge list = the hash-green ext_knn_graph
# oracle; MATERIALIZED pins the expensive self-join to one evaluation.
# Ranks are displayed floor(x*1e9 + 1e-3)/1e9 on both engines: the scaled
# epsilon (1e-12 on the value) absorbs the last-ulp summation-order noise
# between Spark's shuffle-order sums and DuckDB's scan-order sums, which
# sits ~1e-19 absolute after 10 damped iterations.
_PAGERANK_ORACLE = f"""
WITH RECURSIVE
edges AS MATERIALIZED (
    SELECT vec_id AS src, neighbor_id AS dst FROM ({_KNN_GRAPH_ORACLE})
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
pr(iter, id, rank) AS (
    SELECT 0, vec_id, 1.0 / nn.n FROM embeddings, nn
    UNION ALL
    SELECT p.iter + 1, p.id,
           ((1.0 - 0.85) / nn.n + 0.85 * dg.dang / nn.n)
             + 0.85 * COALESCE(c.contrib, 0.0)
    FROM pr p
    CROSS JOIN nn
    CROSS JOIN (SELECT COALESCE(SUM(p2.rank), 0.0) AS dang
                FROM pr p2 LEFT JOIN deg d ON d.src = p2.id
                WHERE d.src IS NULL) dg
    LEFT JOIN (SELECT e.dst, SUM(p3.rank * (1.0 / d.outdeg)) AS contrib
               FROM pr p3 JOIN deg d ON d.src = p3.id
               JOIN edges e ON e.src = p3.id
               GROUP BY e.dst) c ON c.dst = p.id
    WHERE p.iter < 10
)
SELECT id, FLOOR(rank * 1e9 + 1e-3) / 1e9 AS rank FROM pr WHERE iter = 10
"""


@op("ext_pagerank", oracle=_PAGERANK_ORACLE)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the label-blocked kNN similarity graph
    (ext_knn_graph edges, k=3): the corpus-curation signal for hub
    sampling / orphan down-weighting. Vertices = all embedding ids, so
    singleton-block vectors participate as dangling nodes.

    Oracle-checked end-to-end: DuckDB replays the identical 10-iteration
    power iteration as a bounded WITH RECURSIVE over the same (hash-green)
    edge oracle — see _PAGERANK_ORACLE for the float-noise analysis; a
    pytest additionally pins every rank against a pure-Python iteration
    at 1e-9 (tests/test_pagerank.py).

    Edges come from the BLAS kNN twin (ext_knn_graph_batch) — the scale
    path for graph construction; it shares ext_knn_graph's oracle and its
    edge list is pytest-pinned identical to the JVM fold's, so the rank
    oracle is unaffected by the choice."""
    from ..registry import OPS

    edges = (OPS["ext_knn_graph_batch"].fn(spark, sf_dir)
             .select(C("vec_id").alias("src"), C("neighbor_id").alias("dst")))
    verts = (load_table(spark, sf_dir, "embeddings")
             .select(C("vec_id").alias("id")))
    return (pagerank(verts, edges, damping=0.85, iters=10)
            .select("id", (F.floor(C("rank") * 1e9 + 1e-3) / 1e9)
                    .alias("rank")))
