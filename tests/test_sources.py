"""Ingestion + bronze contracts (reference engine.py:21-56 semantics)."""

import os

import pytest
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from agentic_data_pipeline_spark.sources import (
    IngestError, ingest, read_bronze, write_bronze,
)

TMP = "/root/repo/.tmp/test_sources"


def test_unknown_format_raises(spark):
    with pytest.raises(RuntimeError):
        ingest(spark, "/nonexistent", "xml")


def test_reader_error_raises(spark):
    with pytest.raises(RuntimeError):
        ingest(spark, "/nonexistent/never.csv", "csv").collect()


def test_csv_roundtrip_inferred(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = os.path.join(TMP, "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = ingest(spark, path, "csv")  # inferred schema
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_pdf_fallback_pages(spark):
    os.makedirs(os.path.join(TMP, "pdfs"), exist_ok=True)
    with open(os.path.join(TMP, "pdfs", "two_pages.pdf"), "wb") as f:
        f.write("page one text\fpage two text".encode("utf-8"))
    out = ingest(spark, os.path.join(TMP, "pdfs"), "pdf").collect()
    assert [(r["page"], r["content"]) for r in sorted(out, key=lambda r: r["page"])] \
        == [(1, "page one text"), (2, "page two text")]


def test_bronze_roundtrip_and_missing(spark, sf_dir):
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    lake = os.path.join(TMP, "lake")
    path = write_bronze(region, lake, "region", partition_by=["r_regionkey"])
    assert os.path.isdir(path)
    back = read_bronze(spark, lake, "region")
    assert back.count() == region.count()
    # missing dataset → EMPTY frame, not an error (engine.py:52-56)
    missing = read_bronze(spark, lake, "never_written")
    assert missing.count() == 0
    schema = StructType([StructField("a", LongType()), StructField("b", StringType())])
    missing2 = read_bronze(spark, lake, "never_written", schema=schema)
    assert missing2.count() == 0 and missing2.schema == schema
