"""Value-level tests for the round-7 operators: triangle counting
(pure-Python reference), the DP histogram (noise is genuinely Laplace
and genuinely reproducible), vocab coverage (hand-checked OOV math),
and k-center diversity sampling (greedy invariants + assignment)."""

import math
from itertools import combinations

import numpy as np
import pytest

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()


# --- triangle counting -------------------------------------------------

def _ref_triangles(edges):
    """Per-vertex triangle counts by brute force over the undirected
    simple graph."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {x: 0 for x in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return adj, tri


def test_triangle_count_matches_bruteforce(spark):
    from agentic_data_pipeline_spark.operators.graph import triangle_count

    # K4 fused with a triangle plus a pendant edge and a duplicate +
    # self-loop to exercise dedup: K4 on 1-4, triangle 4-5-6, pendant 7.
    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (4, 6), (5, 6), (6, 7), (2, 1), (3, 3)]
    adj, tri = _ref_triangles(raw)
    edges = spark.createDataFrame(raw, "src bigint, dst bigint")
    got = {r["x"]: r for r in triangle_count(edges).collect()}
    assert set(got) == set(adj)
    for x in adj:
        assert got[x]["degree"] == len(adj[x])
        assert got[x]["triangles"] == tri[x], f"vertex {x}"
        d = len(adj[x])
        want = 2.0 * tri[x] / (d * (d - 1)) if d >= 2 else 0.0
        assert got[x]["clustering"] == pytest.approx(want, abs=1e-12)


def test_triangle_count_salted_identical(spark):
    """Apex salting (r8 knob) must be a pure load-balance transform:
    salt_threshold=0 forces EVERY apex through the bucketed path, and the
    full per-vertex result must equal the unsalted run exactly — every
    (b1, b2) wedge pair is produced exactly once, in b2's bucket."""
    from agentic_data_pipeline_spark.operators.graph import triangle_count

    raw = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (4, 6), (5, 6), (6, 7), (2, 1), (3, 3)]
    edges = spark.createDataFrame(raw, "src bigint, dst bigint")
    plain = triangle_count(edges)
    salted = triangle_count(edges, salt_threshold=0, salt_buckets=4)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_triangle_count_on_fixture_nonzero(spark):
    # The kNN similarity graph at sf0.001 must contain triangles (mutual
    # nearest neighbours within a label block) — the gate bites.
    df = OPS["ext_triangle_count"].fn(spark, SF_SMOKE).collect()
    assert sum(r["triangles"] for r in df) > 0
    # every triangle was counted at exactly 3 vertices
    assert sum(r["triangles"] for r in df) % 3 == 0


# --- DP histogram ------------------------------------------------------

def test_dp_histogram_noise_is_laplace_and_reproducible(spark):
    op = OPS["ext_dp_histogram"]
    rows1 = {(r["lang"], r["source"]): r for r in
             op.fn(spark, SF_SMOKE).collect()}
    rows2 = {(r["lang"], r["source"]): r for r in
             op.fn(spark, SF_SMOKE).collect()}
    assert rows1.keys() == rows2.keys() and len(rows1) > 0
    for k in rows1:
        # reproducible: same draw both invocations
        assert rows1[k]["n_noisy"] == rows2[k]["n_noisy"]
        noise = rows1[k]["n_noisy"] - rows1[k]["n_true"]
        # Laplace(b=1) support is unbounded but |noise| > 20 has
        # probability ~2e-9 — a blow-up means the transform is broken.
        assert abs(noise) < 20.0
    noises = [rows1[k]["n_noisy"] - rows1[k]["n_true"] for k in rows1]
    # the draws are not degenerate (distinct groups → distinct noise)
    assert len({round(n, 6) for n in noises}) > 1


def test_dp_histogram_inverse_cdf_math():
    # The inverse-CDF transform reproduced in pure Python must round-trip
    # the Laplace CDF: P(noise ≤ t) = CDF_Laplace(t).
    for h in [0, 1, 7, 2**47, 2**48 - 1]:
        u = (h + 0.5) / float(2**48) - 0.5
        noise = -1.0 * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        # u uniform in (-.5,.5); CDF of the transform at noise recovers
        # u + 0.5 (the standard inverse-CDF identity)
        if noise < 0:
            cdf = 0.5 * math.exp(noise)
        else:
            cdf = 1.0 - 0.5 * math.exp(-noise)
        assert cdf == pytest.approx(u + 0.5, abs=1e-12)


# --- vocab coverage ----------------------------------------------------

def test_vocab_coverage_math(spark):
    rows = OPS["ext_vocab_coverage"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_rate"] == pytest.approx(r["n_oov"] / r["n_tokens"],
                                              abs=0)
    # the top-K cut leaves genuine OOV mass on the synthetic corpus
    assert any(r["n_oov"] > 0 for r in rows)
    # and the vocabulary genuinely covers the head: corpus-wide OOV rate
    # must be well under 1 (top-16 of a 31-term zipf-ish corpus)
    total_oov = sum(r["n_oov"] for r in rows)
    total_tok = sum(r["n_tokens"] for r in rows)
    assert total_oov / total_tok < 0.9


# --- k-center diversity sample -----------------------------------------

def test_kcenter_greedy_invariants(spark):
    from agentic_data_pipeline_spark.operators.similarity import (
        DIVERSITY_K, kcenter_centers)
    from agentic_data_pipeline_spark.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    ids, centers, r_hist, smax = kcenter_centers(emb)
    assert len(ids) == DIVERSITY_K == len(set(ids.tolist()))
    assert len(r_hist) == DIVERSITY_K
    # non-increasing coverage radius
    assert all(b <= a + 1e-12 for a, b in zip(r_hist, r_hist[1:]))
    # greedy theorem: pairwise center separation ≥ final coverage radius
    d2 = ((centers[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    sep = d2[~np.eye(len(ids), dtype=bool)].min()
    assert sep >= r_hist[-1] * (1 - 1e-9)
    # the first center is the max-norm vector of the sample
    rows = (emb.orderBy("vec_id").limit(2048).collect())
    norms = [(sum(v * v for v in r["embedding"]), -r["vec_id"]) for r in rows]
    best = max(range(len(rows)), key=lambda i: norms[i])
    assert ids[0] == rows[best]["vec_id"]


def test_diversity_sample_contract_row(spark):
    row = OPS["ext_diversity_sample"].fn(spark, SF_SMOKE).collect()
    assert len(row) == 1
    r = row[0]
    assert r["assigned_ok"] and r["separation_ok"]
    assert r["monotone_ok"] and r["coverage_match_ok"]
    assert r["n_centers"] == 16
    assert r["n_sample"] == min(r["n_vectors"], 2048)


def test_dp_mean_reproducible_and_sane(spark):
    op = OPS["ext_dp_mean"]
    r1 = {r["o_orderpriority"]: r for r in op.fn(spark, SF_SMOKE).collect()}
    r2 = {r["o_orderpriority"]: r for r in op.fn(spark, SF_SMOKE).collect()}
    assert r1.keys() == r2.keys() and len(r1) == 5
    for k in r1:
        assert r1[k]["dp_mean"] == r2[k]["dp_mean"]  # reproducible draw
        true_mean = r1[k]["sum_clipped"] / r1[k]["n_true"]
        # Laplace(2C/eps) noise / n: at n≈300 (sf0.001) the release sits
        # within ~6 scale units of the clipped mean w.h.p.
        assert abs(r1[k]["dp_mean"] - true_mean) < 6 * 2 * 300_000.0 / r1[k]["n_true"]
        assert r1[k]["sum_clipped"] <= 300_000.0 * r1[k]["n_true"]
