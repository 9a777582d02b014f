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


def test_xlsx_minimal_codec_roundtrip(spark):
    import pandas as pd

    from agentic_data_pipeline_spark.sources.xlsx_minimal import (
        read_xlsx, write_xlsx,
    )

    pdf = pd.DataFrame({
        "i": [1, 2, 30000000000],
        "f": [1.5, -2.25, 3.14159265358979],
        "s": ["plain", "<&>\"'", "sp  aces kept"],
        "b": [True, False, True],
    })
    path = os.path.join(TMP, "codec.xlsx")
    os.makedirs(TMP, exist_ok=True)
    write_xlsx(pdf, path)
    back = read_xlsx(path)
    assert list(back.columns) == ["i", "f", "s", "b"]
    assert list(back["i"]) == [1, 2, 30000000000]
    assert list(back["f"]) == [1.5, -2.25, 3.14159265358979]  # exact doubles
    assert list(back["s"]) == ["plain", "<&>\"'", "sp  aces kept"]
    assert list(back["b"]) == [True, False, True]


def test_pdf_minimal_codec_roundtrip(spark):
    from agentic_data_pipeline_spark.sources.pdf_minimal import (
        extract_pages, write_pdf,
    )

    pages = ["hello world (with) parens \\ and back",
             "second page\nwith two lines"]
    path = os.path.join(TMP, "mini.pdf")
    os.makedirs(TMP, exist_ok=True)
    write_pdf(pages, path)
    payload = open(path, "rb").read()
    assert payload.startswith(b"%PDF-1.4")
    got = extract_pages(payload)
    assert got == pages

    # and through the distributed ingest path (binaryFile + mapInPandas)
    pdf_dir = os.path.join(TMP, "real_pdfs")
    os.makedirs(pdf_dir, exist_ok=True)
    write_pdf(pages, os.path.join(pdf_dir, "doc.pdf"))
    rows = ingest(spark, pdf_dir, "pdf").collect()
    by_page = {r["page"]: r["content"] for r in rows}
    assert by_page == {1: pages[0], 2: pages[1]}


def test_bronze_schema_evolution(spark, tmp_path):
    """Appending a batch with a NEW column must not corrupt the dataset:
    the merged read surfaces the superset schema with nulls backfilled for
    old files — the parquet-lake schema-evolution contract (mergeSchema)."""
    from pyspark.sql import functions as F

    from agentic_data_pipeline_spark.sources.bronze import (
        bronze_path, read_bronze, write_bronze)

    lake = str(tmp_path / "lake")
    v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("source"))
    write_bronze(v1, lake, "evolving")
    v2 = spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("source"), F.lit(0.9).alias("quality"))
    write_bronze(v2, lake, "evolving", mode="append")

    merged = (spark.read.option("mergeSchema", True)
              .parquet(bronze_path(lake, "evolving")))
    assert set(merged.columns) == {"id", "source", "quality"}
    assert merged.count() == 8
    # old rows surface with quality IS NULL, new rows carry their value
    assert merged.filter("quality IS NULL").count() == 5
    assert merged.filter("quality = 0.9").count() == 3
    # the plain read_bronze path still works after evolution
    assert read_bronze(spark, lake, "evolving").count() == 8
