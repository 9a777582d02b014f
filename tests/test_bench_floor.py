"""The of-record floor metric (r9 verdict item 6, r10): min-merged
per-query Spark minima over SAME-EPOCH invocations ÷ DuckDB-twin minima
over ALL same-set invocations. Pure-JSON logic in bench._record_history —
no Spark session needed."""

import json


def _art(unix, epoch, queries, duck, ratio=2.0):
    return {
        "sf": 0.1, "set_version": "v2", "invocation_unix": unix,
        "load_avg": [1.0, 1.0, 1.0], "duckdb_twin_total_sec": 1.0,
        "spark_over_duckdb_ratio": ratio, "value_live": sum(
            queries.values()), "git_sha": "deadbeef",
        "perf_epoch": epoch, "queries": queries, "duckdb_twin_sec": duck,
    }


def test_floor_merges_spark_same_epoch_duck_all_set(tmp_path):
    import bench

    hist = str(tmp_path / "h.jsonl")
    # an OLD-epoch row: its spark times must NOT enter the floor,
    # but its duck twin minima MUST (oracle SQL is code-independent)
    bench._record_history(
        _art(1.0, "r9", {"q1": 0.10, "q2": 0.50}, {"q1": 0.02, "q2": 0.08}),
        hist_path=hist)
    # two current-epoch rows with complementary contention
    bench._record_history(
        _art(2.0, "rX", {"q1": 0.30, "q2": 0.20}, {"q1": 0.05, "q2": 0.10}),
        hist_path=hist)
    out = bench._record_history(
        _art(3.0, "rX", {"q1": 0.20, "q2": 0.40}, {"q1": 0.06, "q2": 0.09}),
        hist_path=hist)
    # spark floor: q1 min(0.30, 0.20)=0.20, q2 min(0.20, 0.40)=0.20
    # (the r9 row's 0.10/0.50 excluded — different engine code)
    # duck floor: q1 min(0.02,0.05,0.06)=0.02, q2 min(0.08,0.10,0.09)=0.08
    assert out["floor_spark_cov_sec"] == 0.4
    assert out["floor_duck_cov_sec"] == 0.1
    assert out["ratio_floor_epoch"] == 4.0
    assert out["value_floor_epoch"] == 0.4
    assert out["n_epoch_invocations"] == 2
    # the raw band still reflects every invocation
    assert out["n_invocations"] == 3
    assert len(json.loads(open(hist).readlines()[-1])["queries"]) == 2


def test_floor_covers_only_twin_covered_queries(tmp_path):
    import bench

    hist = str(tmp_path / "h.jsonl")
    out = bench._record_history(
        _art(1.0, "rX", {"q1": 0.2, "q_noduck": 5.0}, {"q1": 0.1}),
        hist_path=hist)
    assert out["ratio_floor_epoch"] == 2.0          # q_noduck excluded
    assert out["value_floor_epoch"] == 5.2          # but in the value total


def test_skip_duck_row_enters_spark_floor(tmp_path):
    """r10 ADVICE (medium): a SPARK_GRAFT_SKIP_DUCK invocation records
    ratio=None — it must still contribute its per-query Spark minima to
    the floor (default conf, same epoch), while staying out of the
    median/band statistics (no paired ratio exists for it)."""
    import bench

    hist = str(tmp_path / "h.jsonl")
    bench._record_history(
        _art(1.0, "rX", {"q1": 0.50}, {"q1": 0.10}), hist_path=hist)
    out = bench._record_history(
        _art(2.0, "rX", {"q1": 0.20}, {}, ratio=None), hist_path=hist)
    assert out["ratio_floor_epoch"] == 2.0      # spark min 0.20 / duck 0.10
    assert out["n_invocations"] == 1            # median window: paired only
    assert out["n_epoch_floor_rows"] == 2


def test_no_bloom_row_duck_merges_spark_does_not(tmp_path, monkeypatch):
    """r10 ADVICE (low): a no_bloom conf-A/B row's Spark times must stay
    out of the floor (different engine conf) but its DuckDB twin times are
    conf-independent evidence and merge into duck_min."""
    import bench

    hist = str(tmp_path / "h.jsonl")
    monkeypatch.setenv("SPARK_GRAFT_NO_BLOOM", "1")
    bench._record_history(
        _art(1.0, "rX", {"q1": 0.05}, {"q1": 0.02}), hist_path=hist)
    monkeypatch.delenv("SPARK_GRAFT_NO_BLOOM")
    out = bench._record_history(
        _art(2.0, "rX", {"q1": 0.40}, {"q1": 0.10}), hist_path=hist)
    # spark floor ignores the no_bloom 0.05; duck floor takes its 0.02
    assert out["floor_spark_cov_sec"] == 0.4
    assert out["floor_duck_cov_sec"] == 0.02
    assert out["ratio_floor_epoch"] == 20.0
    assert out["n_epoch_floor_rows"] == 1
