"""ext_dedup_minhash_clusters: the distributed composition (LSH pairs →
connected components → survivor table) must equal a pure-Python union-find
over the SAME verified pair set, and must totally partition the corpus."""

from __future__ import annotations


def _union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i in n_ids:
        out.setdefault(find(i), []).append(i)
    # canonical label = min member (find() already roots at min via the
    # min-directed union above)
    return {min(v): len(v) for v in out.values()}


def test_clusters_match_union_find_reference(spark, sf_dir):
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.dedup import (
        minhash_candidates,
    )
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    docs = load_table(spark, sf_dir, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    pairs = [(r["a_id"], r["b_id"]) for r in
             minhash_candidates(docs, "doc_id", "text", 0.5).collect()]
    expect = _union_find(ids, pairs)

    got_rows = OPS["ext_dedup_minhash_clusters"].fn(spark, sf_dir).collect()
    got = {r["survivor_id"]: r["n_members"] for r in got_rows}
    assert got == expect
    # total partition of the corpus; dup flag consistent
    assert sum(got.values()) == len(ids)
    for r in got_rows:
        assert r["is_dup_cluster"] == (r["n_members"] > 1)
