"""Driver-canonicalizer regression guard (VERDICT r2 §next-7).

The driver's oracle compare canonicalizes results with pandas
(sort_values over object columns), which dies on unhashable numpy arrays —
the r1 `ext_inverted_index` failure. This walks EVERY registered op's
output schema and rejects ArrayType/StructType/MapType columns on
oracle-checked ops, so a new op can't reintroduce the failure mode.

Building each op's DataFrame is cheap for lazy ops; a handful are eager
(ingest round-trips, streaming availableNow) — the whole walk is the price
of the guarantee and runs as one test.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded


def test_no_complex_output_columns(spark, sf_dir):
    _ensure_loaded()
    assert len(OPS) >= 147, f"registry shrank: {len(OPS)} ops"
    bad, errs = [], []
    for op_id, op in sorted(OPS.items()):
        try:
            df = op.fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            errs.append(f"{op_id}: {str(e).splitlines()[0][:120]}")
            continue
        complex_cols = [f.name for f in df.schema.fields
                        if isinstance(f.dataType,
                                      (ArrayType, MapType, StructType))]
        if complex_cols and op.oracle:
            bad.append(f"{op_id}: {complex_cols}")
    assert not errs, f"ops failed to build: {errs}"
    assert not bad, f"oracle-checked ops with complex output: {bad}"
