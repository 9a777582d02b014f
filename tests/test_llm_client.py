"""Live-LLM path (twin of test_embedder_real_model.py's pattern): when an
OpenAI-compatible endpoint is configured via LLM_BASE_URL, drive the full
NL→SQL→execution loop through TransformationAgent; otherwise skip with
reason. The request/wiring layer itself is tested offline with a stub
HTTP server, so the only untested-in-container piece is the model."""

from __future__ import annotations

import json
import os
import threading

import pytest


def test_live_llm_end_to_end_when_configured(spark, sf_dir):
    from agentic_data_pipeline_spark.llm_client import make_llm_from_env

    llm = make_llm_from_env()
    if llm is None:
        pytest.skip("LLM_BASE_URL not set — no OpenAI-compatible endpoint "
                    "in this environment; wiring covered by the stub-server "
                    "test below")
    from agentic_data_pipeline_spark.agent import TransformationAgent
    from agentic_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = TransformationAgent(llm=llm).apply_business_rule(
        spark, docs, "keep only rows where lang = 'en'")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_client_against_stub_server(spark, sf_dir):
    """Offline proof of the whole path: a local HTTP stub speaking the
    chat-completions shape returns fenced SQL; the agent must strip the
    fences, run the dialect shim, and execute against CURRENT_TABLE."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            assert req["model"] and req["messages"][0]["content"]
            body = json.dumps({"choices": [{"message": {"content":
                "```sql\nSELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
                "FROM CURRENT_TABLE GROUP BY lang\n```"}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from agentic_data_pipeline_spark.agent import TransformationAgent
        from agentic_data_pipeline_spark.catalog import load_table
        from agentic_data_pipeline_spark.llm_client import (
            make_openai_compatible_llm,
        )

        llm = make_openai_compatible_llm(
            f"http://127.0.0.1:{srv.server_address[1]}", api_key="test")
        docs = load_table(spark, sf_dir, "documents")
        out = TransformationAgent(llm=llm).apply_business_rule(
            spark, docs, "count documents per language")
        from pyspark.sql import functions as F

        got = {r["lang"]: r["n"] for r in out.collect()}
        expect = {r["lang"]: r["cnt"] for r in
                  docs.groupBy("lang")
                  .agg(F.count("*").alias("cnt")).collect()}
        assert got == expect and got
    finally:
        srv.shutdown()


def test_make_llm_from_env_unset_returns_none(monkeypatch):
    from agentic_data_pipeline_spark.llm_client import make_llm_from_env

    monkeypatch.delenv("LLM_BASE_URL", raising=False)
    assert make_llm_from_env() is None
