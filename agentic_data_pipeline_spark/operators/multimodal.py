"""Multimodal (image/audio/video) column handling (task brief / SURVEY §2.5).

Design: media travel as opaque BINARY columns + a typed metadata struct —
the lakehouse-native layout (one row per asset, bytes inline for small
assets; at 100 TB large payloads would hold a URI + byte-range instead, same
schema shape). Decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over mapInPandas: executors see pandas batches of
bytes, never the whole column.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so decode
is STUBBED: `decode_image` raises NotImplementedError by design, and the
pipeline demonstrates with `fake_feature_extract` — a deterministic
bytes→features map — so schema, batching, partitioning, and UDF signatures
are all real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from ..catalog import load_table
from ..registry import op

C = F.col

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("media", BinaryType(), True),          # opaque payload
    StructField("mime", StringType(), True),           # typed metadata...
    StructField("n_bytes", LongType(), True),
    StructField("width", IntegerType(), True),         # decode-time fields,
    StructField("height", IntegerType(), True),        # null until decoded
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("head_hex", StringType(), True),
    StructField("byte_sum_mod", LongType(), True),
])


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL, not present in this container.

    STUB: raises. The Spark-side plumbing (binary column → mapInPandas →
    feature schema) is exercised via fake_feature_extract instead.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in container); "
        "use fake_feature_extract for plumbing tests"
    )


RESIZED_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("media", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Batch image resize over the binary column (mapInPandas shape).

    The real kernel (PIL.Image.resize) is stubbed: without PIL the
    deterministic stand-in truncates/pads the payload to width*height bytes
    — wrong pixels, right plumbing (schema, Arrow batches, partition-local
    work, zero shuffles).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401 — real path, absent here
            raise NotImplementedError("real PIL resize not wired in container")
        except ImportError:
            pass
        n = width * height
        for pdf in batches:
            rows = [
                (int(a), (bytes(m or b"")[:n]).ljust(n, b"\0"), width, height)
                for a, m in zip(pdf["asset_id"], pdf["media"])
            ]
            yield pd.DataFrame(rows, columns=["asset_id", "media", "width", "height"])

    return assets.select("asset_id", "media").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(assets: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling shape: one asset row → N frame rows.

    Real decoder (ffmpeg/pyav) is stubbed; the stand-in treats each
    ``every_n_bytes`` slice as a "frame". The UDTF-style explode (one input
    row, many output rows via mapInPandas) is the part that must scale.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, m in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(m or b"")
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    rows.append((int(a), i, b[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "frame"])

    return assets.select("asset_id", "media").mapInPandas(run, FRAME_SCHEMA)


def fake_feature_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic bytes→features stand-in for a real decoder: payload
    size, first-4-bytes hex (magic number surrogate), byte-sum checksum."""
    for pdf in batches:
        rows = []
        for aid, mime, payload in zip(pdf["asset_id"], pdf["mime"], pdf["media"]):
            b = bytes(payload) if payload is not None else b""
            rows.append((int(aid), mime, len(b), b[:4].hex(),
                         sum(b) % 997))
        yield pd.DataFrame(
            rows, columns=["asset_id", "mime", "n_bytes", "head_hex",
                           "byte_sum_mod"])


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return assets.select("asset_id", "mime", "media").mapInPandas(
        fake_feature_extract, schema=FEATURE_SCHEMA)


def documents_as_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: documents.text UTF-8-encoded as the opaque payload
    (the container ships no real media; the bytes are real bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        C("doc_id").alias("asset_id"),
        F.encode(C("text"), "utf-8").alias("media"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(C("text")).cast("bigint").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


FRAME_BYTES = 64
MAX_FRAMES = 8


@op("ext_frame_sample", oracle=f"""
    WITH a AS (
        SELECT doc_id AS asset_id, text,
               octet_length(encode(text)) AS n
        FROM documents
    )
    SELECT asset_id,
           CAST(g.i AS INT)                                     AS frame_no,
           CAST(octet_length(encode(substring(
               text, g.i * {FRAME_BYTES} + 1, {FRAME_BYTES}))) AS INT)
                                                                AS n_frame_bytes,
           md5(substring(text, g.i * {FRAME_BYTES} + 1, {FRAME_BYTES}))
                                                                AS frame_md5
    FROM a, UNNEST(range(LEAST({MAX_FRAMES},
                          GREATEST(1, n // {FRAME_BYTES})))) AS g(i)
""")
def ext_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling shape registered end-to-end: binary assets →
    sample_frames (mapInPandas UDTF explode: one asset row in, ≤8 frame
    rows out) → per-frame size + md5. The decoder is the deterministic
    byte-slice stand-in (module docstring); the oracle can replay it
    because the fixture payloads are ASCII text, so byte slices equal
    char slices. At 100 TB the explode multiplies rows ~8× but stays
    partition-local — zero shuffles, and frames inherit the asset's
    partitioning for any downstream per-frame featurization.
    """
    assets = documents_as_assets(spark, sf_dir)
    frames = sample_frames(assets, every_n_bytes=FRAME_BYTES,
                           max_frames=MAX_FRAMES)
    return frames.select(
        "asset_id", "frame_no",
        F.octet_length(C("frame")).alias("n_frame_bytes"),
        F.md5(C("frame")).alias("frame_md5"),
    )


@op("ext_resize", oracle="""
    SELECT doc_id                  AS asset_id,
           CAST(16 AS INT)         AS width,
           CAST(16 AS INT)         AS height,
           CAST(256 AS BIGINT)     AS n_bytes,
           md5(substring(text, 1, 256)) AS content_md5
    FROM documents
""")
def ext_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image-resize shape registered end-to-end: binary assets →
    resize_images (Arrow-batched mapInPandas; stubbed kernel pads/truncates
    to width×height bytes) → size/shape summary.

    Oracle-checked on every SQL-expressible invariant: width/height,
    padded size, and the md5 of the NUL-stripped content (truncation of
    ASCII fixture text == substring, so DuckDB can replay it). The md5 of
    the full NUL-padded payload — not expressible in DuckDB varchar — is
    pinned by pytest (tests/test_dedup_and_text.py).
    """
    assets = documents_as_assets(spark, sf_dir)
    resized = resize_images(assets, width=16, height=16)
    stripped = F.regexp_replace(F.decode(C("media"), "utf-8"), "\x00+$", "")
    return resized.select(
        "asset_id", "width", "height",
        F.octet_length(C("media")).alias("n_bytes"),
        F.md5(F.encode(stripped, "utf-8")).alias("content_md5"),
    )


@op("ext_multimodal", oracle="""
    SELECT doc_id AS asset_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           hex(encode(substring(text, 1, 4)))         AS head_hex_uc
    FROM documents
""")
def ext_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset pipeline: encode → schema-typed asset table →
    mapInPandas feature extraction. Oracle checks the SQL-expressible
    invariants (size, head bytes); the checksum is pytest-covered.

    (head_hex comparison works because the fixture text is ASCII, so the
    first 4 *bytes* are the first 4 *chars*.)
    """
    assets = documents_as_assets(spark, sf_dir)
    feats = extract_features(assets)
    return feats.select(
        "asset_id", "mime", "n_bytes",
        F.upper(C("head_hex")).alias("head_hex_uc"),
    )
