#!/usr/bin/env python
"""Throughput probe for the round-5 in-container kernels: pure-Python PNG
codec, WAV codec, and the Word2Vec embedder UDF. Establishes the per-core
cost model for the multimodal/embedding map-only passes (they scale
embarrassingly — cost/row is the whole story; results in BASELINE.md).

Run: python scripts/probe_codec_throughput.py
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe_png() -> None:
    from agentic_data_pipeline_spark.functions.png import (
        decode_png, encode_png, resize_nearest,
    )

    rng = random.Random(42)
    for side in (8, 64, 256):
        px = bytes(rng.randrange(256) for _ in range(side * side))
        n = max(3, 2_000_000 // (side * side))
        t0 = time.perf_counter()
        for _ in range(n):
            enc = encode_png(px, side, side, 1)
        t_enc = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            decode_png(enc)
        t_dec = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            resize_nearest(px, side, side, 1, side // 2, side // 2)
        t_rs = (time.perf_counter() - t0) / n
        mb = side * side / 1e6
        print(f"png {side}x{side}: encode {t_enc*1e3:.2f} ms "
              f"({mb/t_enc:.1f} MB/s)  decode {t_dec*1e3:.2f} ms "
              f"({mb/t_dec:.1f} MB/s)  resize {t_rs*1e3:.3f} ms")


def probe_wav() -> None:
    from agentic_data_pipeline_spark.functions.wav import (
        decode_wav, encode_wav,
    )

    rng = random.Random(42)
    for n_samp in (64, 8000, 160_000):
        samples = [rng.randint(-32768, 32767) for _ in range(n_samp)]
        n = max(3, 2_000_000 // n_samp)
        t0 = time.perf_counter()
        for _ in range(n):
            enc = encode_wav(samples, 8000)
        t_enc = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            decode_wav(enc)
        t_dec = (time.perf_counter() - t0) / n
        ms = n_samp * 2 / 1e6
        print(f"wav {n_samp} samples: encode {t_enc*1e3:.3f} ms "
              f"({ms/t_enc:.1f} MB/s)  decode {t_dec*1e3:.3f} ms "
              f"({ms/t_dec:.1f} MB/s)")


def probe_embedder() -> None:
    from agentic_data_pipeline_spark.registry import _ensure_loaded  # noqa: F401
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-codec")
    spark.sparkContext.setLogLevel("ERROR")
    from agentic_data_pipeline_spark.functions.embedder import (
        make_word2vec_embedder_udf, train_word2vec_vectors,
    )
    from agentic_data_pipeline_spark.operators.similarity import vector_index

    sf = "/root/testdata/sf0.1"
    t0 = time.perf_counter()
    path = train_word2vec_vectors(spark, sf)
    print(f"word2vec train (5k docs, cached across calls): "
          f"{time.perf_counter()-t0:.2f} s")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n = docs.count()
    embed = make_word2vec_embedder_udf(path)
    idx = vector_index(docs, "text", "doc_id", embedder=embed)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        idx.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"embed {n} docs ({tag} worker cache): {dt:.2f} s "
              f"({n/dt:,.0f} docs/s on local[32])")


if __name__ == "__main__":
    probe_png()
    probe_wav()
    probe_embedder()
