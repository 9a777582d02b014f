"""Invariant tests for the fuzzy-dedup family and text ops (the parts the
DuckDB oracle can't check: xxhash64-based signatures, LSH recall)."""

import pytest
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.dedup import (
    jaccard, minhash_candidates, simhash_candidates, word_shingles,
)
from agentic_data_pipeline_spark.operators.text import predict_lang


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from all the hunters")
    near = base.replace("green", "dark")          # 1-word edit → near-dup
    other = ("completely different content about spark query engines and "
             "distributed columnar execution with adaptive partitioning "
             "plus shuffle management and memory spill handling today")
    return spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base)],  # 4 = exact dup of 1
        "doc_id bigint, text string",
    )


def test_minhash_finds_near_and_exact_dups(docs):
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in minhash_candidates(docs, "doc_id", "text", 0.4).collect()}
    assert pairs.get((1, 4)) == 1.0           # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.4   # near dup
    assert all(3 not in p for p in pairs)     # unrelated doc never pairs


def test_simhash_near_dup_hamming(docs):
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in simhash_candidates(docs, "doc_id", "text", 3).collect()}
    assert pairs.get((1, 4)) == 0
    assert all(3 not in p for p in pairs)


def test_jaccard_identity_and_bounds(spark, docs):
    g = docs.select("doc_id", word_shingles(F.col("text")).alias("g"))
    a = g.filter("doc_id=1").select(F.col("g").alias("a")).crossJoin(
        g.filter("doc_id=3").select(F.col("g").alias("b")))
    j = a.select(jaccard(F.col("a"), F.col("b")).alias("j")).head()["j"]
    assert 0.0 <= j < 0.1


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is in of the house"),
         (2, "der hund und die katze ist ein tier"),
         (3, "zzz qqq xxx")],
        "id bigint, text string")
    got = {r["id"]: r["p"] for r in
           df.select("id", predict_lang(F.col("text")).alias("p")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_ann_lsh_recall_vs_exact(spark):
    """LSH approx top-5 should overlap heavily with exact top-5."""
    from agentic_data_pipeline_spark.operators.similarity import (
        ann_lsh_neighbors, ext_ann_lsh, vector_search,
    )
    from agentic_data_pipeline_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = {r["vec_id"] for r in
             vector_search(emb.filter("vec_id <> 0"), qv, k=5).collect()}
    approx = {r["vec_id"] for r in ann_lsh_neighbors(spark, sf).collect()}
    assert len(exact & approx) >= 3  # ≥60% recall on the fixture
    # The registered op's bound-checked contract row must hold.
    row = ext_ann_lsh(spark, sf).collect()[0]
    assert (row.k, row.n_ann, row.recall_ok) == (5, 5, True), row


def test_ann_ivf_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.similarity import (
        ann_ivf_neighbors, ext_ann_ivf, vector_search,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = {r["vec_id"] for r in
             vector_search(emb.filter("vec_id <> 0"), qv, k=5).collect()}
    approx = {r["vec_id"] for r in ann_ivf_neighbors(spark, sf).collect()}
    assert len(approx) == 5
    assert len(exact & approx) >= 2  # weak-structure fixture: 3/5 typical @ nprobe=6
    row = ext_ann_ivf(spark, sf).collect()[0]
    assert (row.k, row.n_ann, row.recall_ok) == (5, 5, True), row


def test_vector_search_batch_matches_exact(spark):
    """The numpy/mapInPandas scale path must return the same neighbors and
    6dp-identical sims as the oracle-checked JVM fold."""
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.similarity import (
        vector_search, vector_search_batch,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = [(r["vec_id"], round(r["sim"], 6))
             for r in vector_search(emb, qv, k=5).collect()]
    batch = [(r["vec_id"], round(r["sim"], 6))
             for r in vector_search_batch(emb, qv, k=5).collect()]
    assert exact == batch


def test_ann_pq_recall_vs_exact(spark):
    """PQ/ADC approx top-5 should overlap with exact top-5 (weak-structure
    fixture: partial recall expected, exact distances are quantized away)."""
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.similarity import (
        ann_pq_neighbors, ext_ann_pq, vector_search,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = {r["vec_id"] for r in
             vector_search(emb.filter("vec_id <> 0"), qv, k=5).collect()}
    approx = {r["vec_id"] for r in ann_pq_neighbors(spark, sf).collect()}
    assert len(approx) == 5
    assert len(exact & approx) >= 1  # 16^8 code space vs near-random vectors
    row = ext_ann_pq(spark, sf).collect()[0]
    assert (row.k, row.n_ann, row.approx_ok) == (5, 5, True), row


def test_connected_components_transitive(spark):
    """A chain a-b, b-c must merge into one component (transitivity), and
    isolated vertices stay singletons."""
    from agentic_data_pipeline_spark.operators.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(6)], "id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "s bigint, t bigint")
    got = {r["id"]: r["component_id"]
           for r in connected_components(vertices, edges).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_connected_components_star_matches_minlabel(spark):
    """large-star/small-star CC must return the exact (id, min-reachable)
    labeling of the min-label algorithm on a seeded random graph (plus
    isolated vertices and a dense clique), and it must converge on a
    diameter-64 chain in O(log n) rounds where min-label needs 64 — the
    separation that makes it the 100 TB choice for long-thin graphs."""
    import random

    from agentic_data_pipeline_spark.operators.dedup import (
        connected_components, connected_components_star,
    )

    rng = random.Random(7)
    n = 60
    edge_list = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edge_list += [(50 + i, 50 + j) for i in range(5) for j in range(i)]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edge_list if s != t],
        "s bigint, t bigint")
    want = {r["id"]: r["component_id"]
            for r in connected_components(vertices, edges).collect()}
    got = {r["id"]: r["component_id"]
           for r in connected_components_star(vertices, edges).collect()}
    assert got == want

    # Chain 0-1-...-64: diameter 64. Star must land the single component
    # in <= 10 rounds (log-bound + fixpoint confirmation); min-label's
    # round count IS the diameter (its docstring contract).
    chain_v = spark.createDataFrame([(i,) for i in range(65)], "id bigint")
    chain_e = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "s bigint, t bigint")
    stats: dict = {}
    comp = connected_components_star(chain_v, chain_e, stats=stats)
    assert {r["component_id"] for r in comp.collect()} == {0}
    assert stats["rounds"] <= 10, stats


def test_passage_dedup_semantics(spark):
    from agentic_data_pipeline_spark.operators.prep import passage_dedup

    w16 = " ".join(f"w{i}" for i in range(16))          # one full chunk
    other = " ".join(f"x{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, w16 + " " + other),   # two distinct chunks
         (2, w16),                 # exact dup of doc 1's first chunk → vanishes
         (3, other + " tail words")],  # chunk 0 dups doc 1; ragged tail survives
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["n_kept"]
           for r in passage_dedup(df, "doc_id", "text", 16).collect()}
    # doc 1 keeps both chunks (first occurrence wins by doc_id order);
    # doc 2 is fully shadowed; doc 3 keeps only its ragged tail chunk.
    assert got == {1: 2, 3: 1}


def test_domain_mix_thresholds(spark):
    """Keep-rate ordering must follow the target weights: premium sources
    (src0-3) retain at least the standard tier's rate, which retains at
    least the web tier's (counts are uniform per source in the fixture)."""
    from agentic_data_pipeline_spark.registry import all_queries
    rows = all_queries()["ext_domain_mix"](spark, "/root/testdata/sf0.01").collect()
    rate = {}
    for r in rows:
        rate.setdefault(r["target_bp"], []).append(r["n_kept"] / r["n_total"])
    avg = {bp: sum(v) / len(v) for bp, v in rate.items()}
    assert avg[1000] >= avg[500] >= avg[250]
    assert avg[1000] == 1.0   # the binding tier keeps everything


def test_minhash_recall_and_precision_vs_exact(spark):
    """Value-level contract for the rows-only minhash op: every reported
    pair carries the TRUE exact jaccard (precision is exact by
    construction — re-verified here), every exact-duplicate pair is
    recovered (deterministic: identical signatures collide in every band),
    and recall on high-J near-dups beats the banding bound."""
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.dedup import (
        jaccard, minhash_candidates, word_shingles,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    grams = docs.select("doc_id", word_shingles(F.col("text"), 3).alias("g"))
    a = grams.select(F.col("doc_id").alias("a_id"), F.col("g").alias("a_g"))
    b = grams.select(F.col("doc_id").alias("b_id"), F.col("g").alias("b_g"))
    j = jaccard(F.col("a_g"), F.col("b_g"))
    exact = {(r["a_id"], r["b_id"]): r["j"] for r in
             a.join(b, F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id", F.round(j, 6).alias("j"))
             .filter("j >= 0.5").collect()}
    got = {(r["a_id"], r["b_id"]): r["jaccard"] for r in
           minhash_candidates(docs, "doc_id", "text", 0.5).collect()}
    assert got, "fixture must contain J>=0.5 pairs"
    for p, jv in got.items():                      # exact precision
        assert p in exact and abs(jv - exact[p]) < 1e-6, (p, jv)
    dups = {p for p, v in exact.items() if v == 1.0}
    assert dups <= set(got)                        # deterministic recall
    hi = {p for p, v in exact.items() if v >= 0.8}
    if hi:                                         # probabilistic recall
        assert len(hi & set(got)) / len(hi) >= 0.8, (len(hi), len(hi & set(got)))


def test_simhash_candidates_complete_for_hamming_bound(spark):
    """The 4x16-band join + verify must return EXACTLY the global
    hamming<=3 pair set — completeness is pigeonhole-guaranteed, so this is
    an equality check against an all-pairs computation, not a sample."""
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.dedup import (
        hamming_bands, simhash_band_table, simhash_candidates,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    sh = simhash_band_table(docs, "doc_id", "text")
    a = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
    truth = {(r["a_id"], r["b_id"]) for r in
             a.join(b, F.col("a_id") < F.col("b_id"))
             .withColumn("h", hamming_bands(F.col("a_sh"), F.col("b_sh")))
             .filter("h <= 3").collect()}
    got = {(r["a_id"], r["b_id"]) for r in
           simhash_candidates(docs, "doc_id", "text", 3).collect()}
    assert got == truth and truth


def test_resize_payload_md5_matches_reference_slice(spark):
    """The resized NUL-padded payload's md5 must equal an independently
    computed md5 of the pad/truncate reference payload for EVERY asset —
    the stub kernel is value-pinned, not just shape-pinned. (The op's
    driver surface carries the NUL-stripped content_md5, which DuckDB can
    twin; the full padded md5 lives here.)"""
    import hashlib

    from pyspark.sql import functions as F
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.multimodal import (
        documents_as_assets, resize_images,
    )
    from tests.conftest import SF_SMOKE

    n = 16 * 16
    resized = resize_images(documents_as_assets(spark, SF_SMOKE), 16, 16)
    rows = resized.select(
        "asset_id", F.octet_length("media").alias("n_bytes"),
        F.md5("media").alias("media_md5")).collect()
    texts = {r["doc_id"]: r["text"] for r in
             load_table(spark, SF_SMOKE, "documents")
             .select("doc_id", "text").collect()}
    assert len(rows) == len(texts)
    for r in rows:
        ref = texts[r["asset_id"]].encode()[:n].ljust(n, b"\0")
        assert r["media_md5"] == hashlib.md5(ref).hexdigest(), r["asset_id"]
        assert r["n_bytes"] == n


def test_similarity_topk_batch_matches_jvm_path(spark):
    """The BLAS multi-query top-k must return the same neighbors and
    6dp-identical sims as the oracle-checked salted JVM path."""
    from agentic_data_pipeline_spark.operators.similarity import (
        ext_similarity_topk, ext_similarity_topk_batch,
    )

    sf = "/root/testdata/sf0.001"
    jvm = sorted((r["query_id"], r["neighbor_id"], round(r["sim"], 6))
                 for r in ext_similarity_topk(spark, sf).collect())
    blas = sorted((r["query_id"], r["neighbor_id"], round(r["sim"], 6))
                  for r in ext_similarity_topk_batch(spark, sf).collect())
    assert jvm == blas


def test_word2vec_train_vocab_and_determinism(spark, sf_dir):
    """Vocabulary must be exactly the words with corpus freq >= minCount;
    re-fit with the same seed/partitioning must be bit-stable. Pins the
    word2vec_vectors() library artifact (the registered op emits the
    folded contract row since r10 — checked at the end)."""
    from collections import Counter

    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.text import word2vec_vectors
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    out1 = {r["word"]: r["l2"]
            for r in word2vec_vectors(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    freq = Counter()
    import re
    for row in docs.select("text").collect():
        freq.update(re.sub("[^a-z]+", " ", row["text"].lower()).split())
    expect_vocab = {w for w, n in freq.items() if n >= 5}
    assert set(out1) == expect_vocab
    assert all(v > 0 for v in out1.values())
    out2 = {r["word"]: r["l2"]
            for r in word2vec_vectors(spark, sf_dir).collect()}
    assert out1 == out2
    # the folded op: one all-invariants-true row over the same fit
    row = OPS["ext_word2vec_train"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    assert row[0]["n_vocab"] == len(expect_vocab)
    assert (row[0]["vocab_match_ok"] and row[0]["dims_ok"]
            and row[0]["norms_ok"])


def test_substring_dedup_finds_verbatim_spans_and_caps_hot_buckets(spark):
    """Two docs sharing a verbatim 8-token span pair up with the right
    shared-window count; a span present in MORE than _SUB_MAXB docs is
    boilerplate and produces no pairs from its windows."""
    from agentic_data_pipeline_spark.operators.dedup import (_SUB_MAXB,
                                                             _SUB_W,
                                                             ext_dedup_substring)

    span = " ".join(f"w{i}" for i in range(_SUB_W + 2))  # 10 tokens
    boiler = " ".join(f"b{i}" for i in range(_SUB_W))    # exactly 1 window
    rows = [(1, f"alpha beta {span} gamma"),
            (2, f"{span} delta epsilon zeta"),
            (3, "unrelated text with no copied span at all here")]
    rows += [(100 + i, f"{boiler} uniq{i}") for i in range(_SUB_MAXB + 1)]
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r.a_id, r.b_id): r.n_shared_windows
               for r in ext_dedup_substring(spark, d).collect()}
    # 10-token shared span -> 3 distinct 8-token windows shared by (1,2).
    assert out.get((1, 2)) == 3, out
    # The boilerplate window appears in _SUB_MAXB+1 docs -> capped out;
    # no pair involves two boilerplate docs.
    assert all(not (a >= 100 and b >= 100) for a, b in out), out


def test_heavy_hitters_threshold_semantics(spark):
    """Every reported token's exact global frequency is >= phi; no
    token at or above phi is missing (exactness, not sketch recall)."""
    from collections import Counter

    from agentic_data_pipeline_spark.operators.text import (_HH_PHI,
                                                            ext_heavy_hitters)

    from tests.conftest import SF_SMOKE

    out = {r.token: (r.cnt, r.freq_ppm)
           for r in ext_heavy_hitters(spark, SF_SMOKE).collect()}
    assert out, "smoke corpus has no heavy hitters?"
    import re
    from agentic_data_pipeline_spark.catalog import load_table
    texts = [r.text for r in
             load_table(spark, SF_SMOKE, "documents").select("text").collect()]
    counts = Counter(t for x in texts
                     for t in re.sub(r"[^a-z0-9]+", " ", x.lower()).split()
                     if t)
    n = sum(counts.values())
    expect = {t: c for t, c in counts.items() if c >= _HH_PHI * n}
    assert set(out) == set(expect), (set(out) ^ set(expect))
    for t, c in expect.items():
        assert out[t][0] == c
        assert out[t][1] == int(c / n * 1e6)
