#!/usr/bin/env python
"""Audit: no oracle-checked op may emit array/struct/map output columns —
the driver's pandas canonicalizer (sort_values over object columns) dies on
unhashable numpy arrays. Flags complex-typed columns in every op's schema."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    _ensure_loaded()
    spark = get_spark()
    bad, errs = [], []
    for op_id, op in sorted(OPS.items()):
        try:
            df = op.fn(spark, SF_DIR)
            complex_cols = [f"{f.name}:{f.dataType.simpleString()}"
                            for f in df.schema.fields
                            if isinstance(f.dataType,
                                          (ArrayType, MapType, StructType))]
            if complex_cols:
                bad.append((op_id, bool(op.oracle), complex_cols))
        except Exception as e:  # noqa: BLE001
            errs.append((op_id, str(e).splitlines()[0][:120]))
    for op_id, has_oracle, cols in bad:
        tag = "ORACLE" if has_oracle else "rows-only"
        print(f"COMPLEX [{tag}] {op_id}: {cols}")
    for op_id, err in errs:
        print(f"ERROR {op_id}: {err}")
    print(f"{len(bad)} ops with complex output, {len(errs)} errors "
          f"of {len(OPS)} total")
    sys.exit(1 if any(b[1] for b in bad) or errs else 0)


if __name__ == "__main__":
    main()
