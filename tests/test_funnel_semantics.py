"""ext_funnel's strict-ordering semantics on handcrafted users — the
chained window-on-window expression the r2 verdict called the subtlest in
the repo. Each case isolates one way the ordering can silently go wrong."""

from __future__ import annotations

from agentic_data_pipeline_spark.operators.temporal import funnel_counts


def _run(spark, rows):
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, us bigint")
    out = {r["step"]: r["n_users"] for r in funnel_counts(ev).collect()}
    return out[1], out[2], out[3]


def test_in_order_user_counts_at_all_steps(spark):
    assert _run(spark, [(1, "view", 10), (1, "click", 20),
                        (1, "purchase", 30)]) == (1, 1, 1)


def test_click_before_view_does_not_convert(spark):
    # click at t=5 precedes the first view — step 2 must NOT count
    assert _run(spark, [(1, "click", 5), (1, "view", 10)]) == (1, 0, 0)


def test_purchase_between_view_and_click_does_not_convert(spark):
    # purchase (15) is after view but before the first qualifying click
    assert _run(spark, [(1, "view", 10), (1, "purchase", 15),
                        (1, "click", 20)]) == (1, 1, 0)


def test_equal_timestamps_are_not_strictly_after(spark):
    assert _run(spark, [(1, "view", 10), (1, "click", 10)]) == (1, 0, 0)
    assert _run(spark, [(1, "view", 10), (1, "click", 20),
                        (1, "purchase", 20)]) == (1, 1, 0)


def test_second_click_after_view_converts(spark):
    # early click doesn't qualify, the later one does — and the purchase
    # must be measured against the first QUALIFYING click (25), not the
    # early one (5): purchase at 27 > 25 counts
    assert _run(spark, [(1, "click", 5), (1, "view", 10),
                        (1, "click", 25), (1, "purchase", 27)]) == (1, 1, 1)


def test_purchase_against_first_qualifying_click_only(spark):
    # purchase at 22 is after the early junk click (5) but before the
    # qualifying click (25) — must NOT count
    assert _run(spark, [(1, "click", 5), (1, "view", 10),
                        (1, "click", 25), (1, "purchase", 22)]) == (1, 1, 0)


def test_no_view_user_never_counts(spark):
    assert _run(spark, [(1, "click", 5), (1, "purchase", 9)]) == (0, 0, 0)


def test_users_are_independent(spark):
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full
        (2, "view", 10), (2, "click", 5),                        # view only
        (3, "view", 10), (3, "click", 20),                       # 2 steps
        (4, "purchase", 1),                                      # nothing
    ]
    assert _run(spark, rows) == (3, 2, 1)


def test_funnel_matches_python_reference_on_random_logs(spark):
    """500 seeded random users, every (steps, times, order) combination the
    generator can produce, one Spark job — funnel_counts must equal a
    direct Python evaluation of the strict-ordering definition."""
    import random

    rng = random.Random(42)
    types = ["view", "click", "purchase", "scroll"]  # scroll = noise
    rows, by_user = [], {}
    for u in range(500):
        evs = [(rng.choice(types), rng.randint(0, 20))
               for _ in range(rng.randint(0, 8))]
        by_user[u] = evs
        rows += [(u, t, us) for t, us in evs]

    def ref_counts():
        c1 = c2 = c3 = 0
        for evs in by_user.values():
            t1 = min((us for t, us in evs if t == "view"), default=None)
            if t1 is None:
                continue
            c1 += 1
            t2 = min((us for t, us in evs
                      if t == "click" and us > t1), default=None)
            if t2 is None:
                continue
            c2 += 1
            if any(t == "purchase" and us > t2 for t, us in evs):
                c3 += 1
        return c1, c2, c3

    ev = spark.createDataFrame(
        [r for r in rows if r[1] in ("view", "click", "purchase")],
        "user_id bigint, event_type string, us bigint")
    from agentic_data_pipeline_spark.operators.temporal import funnel_counts
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev).collect()}
    assert (got[1], got[2], got[3]) == ref_counts()


def test_retention_matches_python_reference_on_random_logs(spark, tmp_path):
    """ext_retention on a synthetic random lake vs direct Python evaluation
    of the cohort definition (first-seen day, distinct users per offset)."""
    import os
    import random
    from collections import defaultdict

    from pyspark.sql import functions as F
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    rng = random.Random(7)
    day_us = 86_400_000_000
    rows = []
    for u in range(300):
        for _ in range(rng.randint(1, 6)):
            day = rng.randint(0, 9)
            us = day * day_us + rng.randint(0, day_us - 1)
            rows.append((u, us))

    sf_dir = str(tmp_path / "rlake")
    df = spark.createDataFrame(rows, "user_id bigint, us bigint").select(
        F.monotonically_increasing_id().alias("event_id"),
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"))
    df.write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet"))

    first_day = {}
    days_of = defaultdict(set)
    for u, us in rows:
        d = us // day_us
        days_of[u].add(d)
        first_day[u] = min(first_day.get(u, d), d)
    expect = defaultdict(set)
    for u, days in days_of.items():
        d0 = first_day[u]
        for d in days:
            expect[(d0 * 86_400, int(d - d0))].add(u)
    expect_counts = {k: len(v) for k, v in expect.items()}

    got = {(r["cohort_epoch"], r["day_offset"]): r["n_users"]
           for r in OPS["ext_retention"].fn(spark, sf_dir).collect()}
    assert got == expect_counts
