"""Streaming plane: the readStream tumbling-window agg must equal its batch
twin (q_tumble) on the same input — kappa-consistency check."""

from agentic_data_pipeline_spark.catalog import table_path
from agentic_data_pipeline_spark.operators.sql_surface import q_tumble
from agentic_data_pipeline_spark.operators.streaming_ops import _as_stream_dir
from agentic_data_pipeline_spark.streaming.windows import run_stream_to_table


def test_stream_matches_batch(spark, sf_dir):
    run_stream_to_table(spark, _as_stream_dir(table_path(sf_dir, "events")),
                        "t_stream")
    got = {(r["bucket_epoch"], r["event_type"]): (r["cnt"], r["sum_value"])
           for r in spark.table("t_stream").collect()}
    exp = {(r["bucket_epoch"], r["event_type"]): (r["cnt"], r["sum_value"])
           for r in q_tumble(spark, sf_dir).collect()}
    assert got == exp and len(got) > 0
