#!/usr/bin/env python
"""Driver pre-flight: replay the verification driver's EXACT environment —
a vanilla (untuned) SparkSession it builds itself, the __spark_entry__
contract, sf0.01 — over the ops that will actually consume the round's
driver budget (the head of DRIVER_PRIORITY), with the same
canonicalize-and-compare as tests/parity_util.

parity_sweep.py answers "are the oracles right?" on OUR tuned session;
this answers "will the DRIVER reproduce that?" — the r1 lake's
INT64-nanos events table famously needed defensive tune() calls inside
every op, and an op that forgets one passes parity_sweep but fails here.

Run:  python scripts/driver_preflight.py [n_ops] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    n_budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .appName("driver-preflight").getOrCreate())  # untuned!

    import __spark_entry__ as contract
    from tests.parity_util import duck_connect, compare

    qs, osql = contract.queries(), contract.oracle_sql()
    duck = duck_connect(sf)
    head = list(qs)[:n_budget]

    # Budget-hygiene preflight (r8 verdict item 7): every slot in the
    # driver's budget window must be a driver_visible op WITH an oracle —
    # a hidden or oracle-less op in the window burns a slot on a
    # guaranteed no_oracle row. queries() already filters hidden ops;
    # this asserts the DRIVER_PRIORITY head and the queries() head agree
    # (a hidden op slipped into the priority head silently shifts the
    # window) and that each windowed op has oracle SQL.
    from agentic_data_pipeline_spark.registry import (DRIVER_PRIORITY, OPS,
                                                      _ensure_loaded)
    _ensure_loaded()
    visible_head = [o for o in DRIVER_PRIORITY
                    if OPS[o].driver_visible][:n_budget]
    assert visible_head == head, (
        "queries() order diverged from DRIVER_PRIORITY's visible head: "
        f"{[x for x in zip(visible_head, head) if x[0] != x[1]][:5]}")
    no_oracle = [o for o in head if o not in osql]
    assert not no_oracle, f"budget window has oracle-less ops: {no_oracle}"
    fails, t0 = [], time.time()
    for name in head:
        try:
            df = qs[name](spark, sf)
            if name in osql:
                compare(df, duck, osql[name])
            else:
                assert df.count() >= 0
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {str(e).splitlines()[0][:140]}", flush=True)
    print(f"{len(head) - len(fails)}/{len(head)} driver-budget ops pass on a "
          f"VANILLA session at {sf} in {time.time() - t0:.0f}s")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
