"""ext_pagerank: every rank must match a pure-Python power iteration on
the same edge list (same damping, iteration count, and dangling-mass
redistribution) to 1e-9 — pinning the distributed iteration exactly."""

from __future__ import annotations


def _reference_pagerank(vert_ids, edge_list, d=0.85, iters=10):
    n = len(vert_ids)
    out = {}
    for s, t in edge_list:
        out.setdefault(s, []).append(t)
    ranks = {v: 1.0 / n for v in vert_ids}
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in out)
        contrib = {v: 0.0 for v in vert_ids}
        for s, ts in out.items():
            share = ranks[s] / len(ts)
            for t in ts:
                contrib[t] += share
        base = (1.0 - d) / n + d * dangling / n
        ranks = {v: base + d * contrib[v] for v in vert_ids}
    return ranks


def test_pagerank_matches_reference(spark, sf_dir):
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.graph import pagerank
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    edges_df = (OPS["ext_knn_graph"].fn(spark, sf_dir)
                .selectExpr("vec_id AS src", "neighbor_id AS dst"))
    edge_list = [(r["src"], r["dst"]) for r in edges_df.collect()]
    verts = [r["vec_id"] for r in
             load_table(spark, sf_dir, "embeddings").select("vec_id").collect()]
    got = {r["id"]: r["rank"]
           for r in pagerank(
               spark.createDataFrame([(v,) for v in verts], "id bigint"),
               edges_df, damping=0.85, iters=10).collect()}
    expect = _reference_pagerank(verts, edge_list)
    assert set(got) == set(expect)
    worst = max(abs(got[v] - expect[v]) for v in verts)
    assert worst < 1e-9, f"max rank deviation {worst}"
    # mass conservation: ranks sum to 1
    assert abs(sum(got.values()) - 1.0) < 1e-9
