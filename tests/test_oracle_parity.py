"""Run every registered op at sf0.001 and hash-compare against its DuckDB
oracle — the local pre-check for the driver's CORRECTNESS gate. Rows-only
ops (no oracle) are checked for successful execution + stable schema."""

import pytest

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from tests.conftest import SF_SMOKE
from tests.parity_util import compare, duck_connect

_ensure_loaded()
ORACLE_OPS = sorted(k for k, v in OPS.items() if v.oracle is not None)
ROWS_ONLY_OPS = sorted(k for k, v in OPS.items() if v.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("op_id", ORACLE_OPS)
def test_oracle_parity(spark, duck, op_id):
    compare(OPS[op_id].fn(spark, SF_SMOKE), duck, OPS[op_id].oracle)


@pytest.mark.parametrize("op_id", ROWS_ONLY_OPS)
def test_rows_only_runs(spark, op_id):
    df = OPS[op_id].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert rows is not None
    assert len(df.schema.fields) > 0
