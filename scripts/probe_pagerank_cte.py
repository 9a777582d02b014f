#!/usr/bin/env python
"""A/B: Python-orchestrated power iteration (graph.pagerank) vs a single
Spark 4 recursive CTE (the DuckDB oracle's own shape, UnionLoopExec).

Motivation: at sf0.1 ext_pagerank spends ~2.4 s on 10 driver-synced
rounds (localCheckpoint per round) while DuckDB's recursive CTE does the
same arithmetic in ~0.5 s; if Spark's WITH RECURSIVE executes the loop
inside one query, the 10 Python→JVM round-trips and eager checkpoints
disappear. Correctness gate: the CTE variant must produce the same
floor(1e9) ranks as the op. Run: python scripts/probe_pagerank_cte.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Single-self-reference recursive shape (Spark enforces one reference to
# the recursive relation per step, unlike DuckDB's three in the oracle):
# carry (iter, id, rank, w_out, has_out) per vertex and compute both the
# dangling mass and the per-dst contribution sums with WINDOW functions
# over the one reference, joined to the static edge list.
CTE = """
WITH RECURSIVE pr(iter, id, rank, has_out) AS (
    SELECT 0, id, CAST(1.0 / {n} AS DOUBLE), has_out FROM verts
    UNION ALL
    SELECT p.iter + 1, p.id,
           (1.0 - 0.85) / {n} + 0.85 * p.dang / {n}
             + 0.85 * COALESCE(c.contrib, CAST(0.0 AS DOUBLE)),
           p.has_out
    FROM (SELECT iter, id, rank, has_out,
                 SUM(CASE WHEN has_out THEN CAST(0.0 AS DOUBLE)
                     ELSE rank END) OVER () AS dang
          FROM pr WHERE iter < 10) p
    LEFT JOIN (SELECT e.dst, SUM(p2.rank * e.w) AS contrib
               FROM (SELECT iter, id, rank FROM pr WHERE iter < 10) p2
               JOIN w_edges e ON e.src = p2.id
               GROUP BY e.dst) c ON c.dst = p.id
)
SELECT id, FLOOR(rank * 1e9 + 1e-3) / 1e9 AS rank FROM pr WHERE iter = 10
"""


def main() -> None:
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.graph import pagerank
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
    from agentic_data_pipeline_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="pagerank-cte-probe")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (OPS["ext_knn_graph_batch"].fn(spark, SF)
             .select(F.col("vec_id").alias("src"),
                     F.col("neighbor_id").alias("dst")))
    verts = load_table(spark, SF, "embeddings") \
        .select(F.col("vec_id").alias("id"))
    n = verts.count()

    w_edges = (edges.join(edges.groupBy("src")
                          .agg(F.count(F.lit(1)).alias("outdeg")), "src")
               .select("src", "dst", (1.0 / F.col("outdeg")).alias("w"))
               .localCheckpoint())
    has_out = w_edges.select("src").distinct()
    (verts.join(has_out.select(F.col("src").alias("id"),
                               F.lit(True).alias("__has")), "id", "left")
     .select("id", F.coalesce(F.col("__has"), F.lit(False)).alias("has_out"))
     .localCheckpoint()).createOrReplaceTempView("verts")
    w_edges.createOrReplaceTempView("w_edges")

    sql = CTE.format(n=float(n))

    def t(fn):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    loop = lambda: (pagerank(verts, edges, 0.85, 10)  # noqa: E731
                    .select("id", (F.floor(F.col("rank") * 1e9 + 1e-3) / 1e9)
                            .alias("rank")))
    cte = lambda: spark.sql(sql)  # noqa: E731

    # correctness first
    a = {r.id: r.rank for r in loop().collect()}
    try:
        b = {r.id: r.rank for r in cte().collect()}
        same = a == b
    except Exception as e:  # noqa: BLE001
        print("CTE failed:", str(e).splitlines()[0][:300])
        return
    print("ranks identical:", same, f"(n={len(a)})")
    if not same:
        diff = [(k, a[k], b.get(k)) for k in list(a)[:5] if a[k] != b.get(k)]
        print("sample diffs:", diff[:5])
    for name, fn in (("loop", loop), ("cte", cte)):
        runs = [t(fn) for _ in range(3)]
        print(name, [round(x, 3) for x in runs], "min", round(min(runs), 3),
              flush=True)


if __name__ == "__main__":
    main()
