#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of declared queries to files.

Usage: python scripts/dump_plans.py <repo_root> <out_dir> <suffix> <q1> [q2 ...]

Imports the engine from <repo_root> (so a historical checkout produces the
historical plan), builds each query's DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.1), and writes <out_dir>/<name>_<suffix>.txt. Iterative ops
(pagerank et al.) execute their orchestration during construction — the
dumped plan is the final returned DataFrame's, which is the honest artifact
for them (the per-round plans are identical modulo the lineage cut).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    repo, out_dir, suffix, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agentic_data_pipeline_spark.registry import all_ops_queries
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_ops_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — engine: {repo}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
