#!/usr/bin/env python
"""Driver-scale oracle-parity sweep: run EVERY oracle-checked op at the
driver's verification scale (sf0.01 by default) through the same
canonicalize-and-compare the local pytest harness uses. The pytest suite
runs at sf0.001 for speed; this catches SF-dependent mismatches (row-count
thresholds, percentile ties, window frames) before the driver does.

Run:  python scripts/parity_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark
from tests.parity_util import duck_connect, compare


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _ensure_loaded()
    spark = get_spark(app_name="parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connect(sf)
    names = [k for k, v in OPS.items() if v.oracle]
    fails, t0 = [], time.time()
    for k in names:
        try:
            compare(OPS[k].fn(spark, sf), duck, OPS[k].oracle)
        except Exception as e:  # noqa: BLE001
            fails.append(k)
            print(f"FAIL {k}: {str(e).splitlines()[0][:140]}", flush=True)
    print(f"{len(names) - len(fails)}/{len(names)} oracle ops pass at "
          f"{sf} in {time.time() - t0:.0f}s")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
