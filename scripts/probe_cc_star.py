#!/usr/bin/env python
"""Round-count separation probe: min-label CC vs large-star/small-star CC
on diameter-d chain graphs.

Min-label propagation (dedup.connected_components) runs one round per unit
of graph diameter — the right tool for near-dup clusters (diameter <= 3-4)
but a 100 TB hazard on long-thin graphs (web-link chains, citation paths)
where diameter grows with the data. Large-star/small-star (Kiveris et al.,
SoCC 2014; dedup.connected_components_star) contracts toward component
minima and converges in O(log n) rounds regardless of diameter.

This probe runs both on chains of diameter 64 / 256 / 1024 and prints the
measured rounds. Expected: min-label rounds ~= diameter (it is CAPPED at
max_iter and returns unconverged labels beyond it — printed as ">cap");
star rounds grow logarithmically. Labels are cross-checked where min-label
converges; star labels are checked against ground truth (all zero) always.

Run:  python scripts/probe_cc_star.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from agentic_data_pipeline_spark.session import get_spark
    from agentic_data_pipeline_spark.operators.dedup import (
        connected_components, connected_components_star,
    )

    spark = get_spark(app_name="probe-cc-star")
    spark.sparkContext.setLogLevel("ERROR")

    for diameter in (64, 256, 1024):
        v = spark.createDataFrame(
            [(i,) for i in range(diameter + 1)], "id bigint")
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(diameter)], "s bigint, t bigint")

        stats_star: dict = {}
        t0 = time.time()
        comp = connected_components_star(v, e, max_iter=64, stats=stats_star)
        labels = {r["component_id"] for r in comp.collect()}
        t_star = time.time() - t0
        assert labels == {0}, f"star wrong at d={diameter}: {labels}"

        stats_min: dict = {}
        cap = 32
        t0 = time.time()
        comp_m = connected_components(v, e, max_iter=cap, stats=stats_min)
        labels_m = {r["component_id"] for r in comp_m.collect()}
        t_min = time.time() - t0
        converged = labels_m == {0}
        mr = stats_min["rounds"]
        print(f"diameter {diameter:5d}: star rounds={stats_star['rounds']:3d} "
              f"({t_star:5.1f}s, exact)   min-label rounds="
              f"{mr if converged else f'>{cap} (cap hit, UNconverged)'} "
              f"({t_min:5.1f}s)")

    print("\nConclusion: star round count is logarithmic in diameter; "
          "min-label is linear and silently wrong past its cap. Near-dup "
          "graphs (diameter<=4) keep min-label (2 shuffles/round vs star's "
          "~5); anything diameter-unbounded at 100 TB uses the star op.")


if __name__ == "__main__":
    main()
