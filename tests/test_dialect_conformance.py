"""Dialect-shim conformance: the kind of DuckDB SQL an LLM emits for the
reference's rules (agent.py:40-47) must run through sql_exec(dialect=
"duckdb") and produce DuckDB-identical results on the same data. This is
the EP2 path's safety net — every query here runs on BOTH engines."""

import duckdb
import pytest

from agentic_data_pipeline_spark.plans.dialect import sql_exec
from tests.parity_util import canonical_rows

# (name, duckdb-dialect SQL over CURRENT_TABLE) — bound to `orders`
CASES = [
    ("filter_sort", """
        SELECT o_orderkey, o_totalprice FROM CURRENT_TABLE
        WHERE o_totalprice > 300000 AND o_orderstatus = 'F'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""),
    ("group_count", """
        SELECT o_orderpriority, COUNT(*) AS n FROM CURRENT_TABLE
        GROUP BY o_orderpriority"""),
    ("case_bands", """
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 100000 THEN 'small' ELSE 'big' END AS band
        FROM CURRENT_TABLE WHERE o_orderkey < 100"""),
    ("len_rewrite", """
        SELECT o_orderkey, len(o_orderpriority) AS pl
        FROM CURRENT_TABLE WHERE o_orderkey < 50"""),
    ("intdiv_rewrite", """
        SELECT o_orderkey // 100 AS bucket, COUNT(*) AS n
        FROM CURRENT_TABLE GROUP BY 1"""),
    ("string_split_rewrite", """
        SELECT o_orderkey, string_split(o_orderpriority, '-')[1] AS pri_code
        FROM CURRENT_TABLE WHERE o_orderkey < 50"""),
    ("distinct_year", """
        SELECT DISTINCT CAST(YEAR(o_orderdate) AS INT) AS yr FROM CURRENT_TABLE"""),
    ("ilike", """
        SELECT o_orderkey FROM CURRENT_TABLE
        WHERE o_orderpriority ILIKE '%urgent%' AND o_orderkey < 200"""),
    ("in_subquery", """
        SELECT COUNT(*) AS n FROM CURRENT_TABLE
        WHERE o_custkey IN (SELECT o_custkey FROM CURRENT_TABLE
                            GROUP BY o_custkey HAVING COUNT(*) > 3)"""),
    ("coalesce_nullif", """
        SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS st
        FROM CURRENT_TABLE WHERE o_orderkey < 50"""),
    ("qualify_topn", """
        SELECT o_custkey, o_orderkey, o_totalprice FROM CURRENT_TABLE
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) = 1"""),
    ("qualify_with_tail", """
        SELECT o_custkey, o_orderkey, o_totalprice FROM CURRENT_TABLE
        QUALIFY RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC) <= 2
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""),
    ("star_exclude", """
        SELECT * EXCLUDE (o_orderpriority, o_orderdate) FROM CURRENT_TABLE
        WHERE o_orderkey < 20"""),
    ("list_literal", """
        SELECT o_orderkey FROM CURRENT_TABLE
        WHERE list_contains(['1-URGENT', '2-HIGH'], o_orderpriority)
          AND o_orderkey < 200"""),
    ("epoch_rewrite", """
        SELECT o_orderkey, epoch(o_orderdate) AS es
        FROM CURRENT_TABLE WHERE o_orderkey < 50"""),
    ("strftime_rewrite", """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym
        FROM CURRENT_TABLE WHERE o_orderkey < 50"""),
    ("regexp_matches_rewrite", """
        SELECT o_orderkey FROM CURRENT_TABLE
        WHERE regexp_matches(o_orderpriority, 'URGENT|HIGH') AND o_orderkey < 100"""),
    ("quantile_cont_rewrite", """
        SELECT quantile_cont(o_totalprice, 0.5) AS med FROM CURRENT_TABLE"""),
    ("string_agg_rewrite", """
        SELECT o_orderkey, string_agg(o_orderstatus, '|') AS st
        FROM CURRENT_TABLE WHERE o_orderkey < 30 GROUP BY o_orderkey"""),
]


@pytest.fixture(scope="module")
def bound(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    return orders, con


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
def test_duckdb_dialect_sql_matches(spark, bound, name, sql):
    orders, con = bound
    got = sql_exec(spark, sql, df=orders, dialect="duckdb").toPandas()
    exp = con.execute(sql.replace("CURRENT_TABLE", "t")).df()
    # normalize DuckDB's wider integer outputs for comparison
    for c in exp.columns:
        if str(exp[c].dtype) in ("object",):
            continue
        if str(exp[c].dtype).startswith(("int", "uint")) or \
                str(exp[c].dtype) == "float64":
            pass
    assert sorted(got.columns) == sorted(c.lower() for c in exp.columns) or \
        sorted(got.columns) == sorted(exp.columns)
    g, e = canonical_rows(got), canonical_rows(exp)
    assert len(g) == len(e), f"{name}: rows {len(g)} vs {len(e)}"
    assert g == e, f"{name}: value mismatch, first={g[:2]} vs {e[:2]}"
