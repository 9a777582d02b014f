"""Sessionization: batch vs custom-stateful-streaming consistency, plus a
hand-checked golden case."""

import pandas as pd

from agentic_data_pipeline_spark.catalog import table_path
from agentic_data_pipeline_spark.operators.sessionize import ext_sessionize
from agentic_data_pipeline_spark.operators.streaming_ops import _as_stream_dir
from agentic_data_pipeline_spark.streaming.sessions import run_sessionize_to_table

US = 1_000_000
MIN = 60 * US


def test_golden_sessions(spark, tmp_path):
    # user 1: two events 10 min apart (one session), then 45 min gap (new)
    rows = [
        (1, 1, 1000 * 0 * MIN * 1000, 10.0),
        (2, 1, 1000 * 0 * MIN * 1000 + 10 * MIN * 1000, 5.5),
        (3, 1, 1000 * 0 * MIN * 1000 + 55 * MIN * 1000, 1.0),
        (4, 2, 1000 * 0 * MIN * 1000, 2.0),
    ]  # ts in *nanos* (event_id, user_id, ts, value)
    df = spark.createDataFrame(
        [(e, u, t, "x", v, "{}") for (e, u, t, v) in rows],
        "event_id bigint, user_id bigint, ts bigint, event_type string, "
        "value double, props string")
    p = str(tmp_path / "ev.parquet")
    df.write.mode("overwrite").parquet(p)

    # ext_sessionize reads {sf_dir}/events.parquet — lay the file out that way
    import os
    import shutil

    import agentic_data_pipeline_spark.operators.sessionize as sz
    os.makedirs(str(tmp_path / "lake"), exist_ok=True)
    shutil.move(p, str(tmp_path / "lake" / "events.parquet"))
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
           for r in sz.ext_sessionize(spark, str(tmp_path / "lake")).collect()}
    assert got == {(1, 1): (2, 15.5), (1, 2): (1, 1.0), (2, 1): (1, 2.0)}


def test_stream_sessionize_matches_batch(spark, sf_dir):
    run_sessionize_to_table(
        spark, _as_stream_dir(table_path(sf_dir, "events")), "t_sessions")
    got = spark.table("t_sessions").toPandas()
    exp = ext_sessionize(spark, sf_dir).toPandas()
    key = ["user_id", "session_id"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(
        g[["user_id", "session_id", "n_events", "sum_value",
           "session_start_epoch"]],
        e[["user_id", "session_id", "n_events", "sum_value",
           "session_start_epoch"]],
        check_dtype=False,
    )
