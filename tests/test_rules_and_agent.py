"""Golden-output tests for the 4 canonical rules + the NL agent front-end
(reference agent.py semantics, SURVEY.md §2.4/§5.3)."""

import pytest
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.agent import TransformationAgent
from agentic_data_pipeline_spark.operators import rules


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", "USD", 100.0),
            (2, "bad-email", "EUR", 200.0),
            (3, "c@y.org", "GBP", 50.0),
            (4, "d@@z.com", "USD", 1000.0),
            (5, "e@w.io", "EUR", 10.0),
        ],
        "id bigint, email string, currency string, revenue double",
    )


def test_clean_emails_golden(people):
    kept = sorted(r["id"] for r in rules.clean_emails(people, "email").collect())
    assert kept == [1, 3, 5]


def test_standardize_currency_golden(spark, people):
    out = rules.standardize_currency(
        people, "revenue", "currency", {"USD": "1.0000", "EUR": "2.0000"},
        spark=spark)
    got = {r["id"]: r["usd_amount"] for r in out.collect()}
    assert got[1] == 100.0 and got[2] == 400.0 and got[5] == 20.0
    assert got[3] is None  # unknown currency → null (left join), row kept


def test_remove_outliers_golden(spark):
    # 10 points at 10.0 ± small spread and one wild outlier
    rows = [(i, 10.0 + (i % 3) * 0.5) for i in range(10)] + [(99, 10000.0)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    kept = sorted(r["id"] for r in rules.remove_outliers(df, ["v"]).collect())
    assert 99 not in kept and len(kept) == 10


def test_top_performers_golden(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 21)], "id bigint, sales double")
    kept = sorted(r["id"] for r in rules.top_performers(df, "sales", 0.10).collect())
    # percent_rank >= 0.9 over 20 rows (pr = (rank-1)/19) → ranks 19..20
    assert kept == [19, 20]


def test_agent_catalog_rule_by_name(spark, people):
    agent = TransformationAgent(llm=None)
    out = agent.apply_business_rule(
        spark, people, "whatever", rule_name="clean_emails")
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 5]


def test_agent_llm_path_with_dialect_shim(spark, people):
    # A fake LLM emitting fenced DuckDB SQL; shim strips fences & rewrites.
    def fake_llm(prompt):
        assert "CURRENT_TABLE" in prompt
        return "```sql\nSELECT id, len(email) AS n FROM CURRENT_TABLE WHERE id <= 2\n```"

    agent = TransformationAgent(llm=fake_llm)
    out = agent.apply_business_rule(spark, people, "count email lengths")
    got = {r["id"]: r["n"] for r in out.collect()}
    assert got == {1: 7, 2: 9}


def test_agent_error_falls_back_to_identity(spark, people):
    agent = TransformationAgent(llm=lambda p: "SELECT bogus syntax !!!")
    out = agent.apply_business_rule(spark, people, "do something impossible")
    assert out.count() == people.count()  # identity pass-through (agent.py:49-51)


def test_agent_keyword_fallback(spark, people):
    agent = TransformationAgent(llm=None)
    out = agent.apply_business_rule(spark, people, "please filter this data")
    assert out.count() == 5  # min(10, n) head with pinned order
