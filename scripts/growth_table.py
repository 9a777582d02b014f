#!/usr/bin/env python3
"""Three-tier growth table (r7 verdict item 5): per-query
{spark, duck, ratio} at sf0.1 / sf1 / sf3 from the committed bench
detail artifacts, so the "dispatch floor amortizes with scale" defense
for the sub-second watch queries is a measured curve, not an argument.

Usage: python scripts/growth_table.py [--all]
  default: the VERDICT r7 watch queries + the tier totals
  --all:   every query present in all three artifacts
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIERS = ["0.1", "1", "3", "10"]  # sf10 is the r9 WATCH-SUBSET tier
# (SPARK_GRAFT_ONLY, set_version v2sub): its artifact carries only the 8
# watch queries, so its "twin-covered total" covers just those.
WATCH = [
    "q9_product_profit", "q15_top_supplier", "q21_waiting_suppliers",
    "q16_part_supplier_counts", "q17_small_quantity", "q18_large_orders",
    "q22_dormant_customers", "q2_min_cost_supplier",
]


def load(tier: str) -> dict:
    """Detail artifact for the tier, with per-query times merged down to
    the min across every SAME-SHA invocation recorded in
    BENCH_HISTORY.jsonl (each invocation is itself best-of-3; the min
    over invocations is the least-contended measurement of the SAME
    code). History rows carry per-query maps since r8; older rows — and
    the detail file itself — still contribute."""
    path = os.path.join(REPO, "bench_artifacts", f"detail_sf{tier}_v2.json")
    if not os.path.isfile(path):  # subset tier (sf10): v2sub artifact
        path = os.path.join(REPO, "bench_artifacts",
                            f"detail_sf{tier}_v2sub.json")
    art = json.load(open(path))
    sha, sf = art.get("git_sha"), art.get("sf")
    n_inv = 1
    hist_path = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    if os.path.isfile(hist_path):
        for line in open(hist_path):
            e = json.loads(line)
            if e.get("sf") != sf or e.get("set_version") != art.get(
                    "set_version"):
                continue
            if e.get("invocation_unix") == art.get("invocation_unix"):
                continue  # the artifact's own run also logs a history row
                # — counting it would overstate n_inv by one (r8 ADVICE)
            e_sha = e.get("git_sha") or ""
            # compact bench lines truncate the sha to 12 chars; match on
            # the common prefix — but BOTH shas must be non-empty, or a
            # row recorded outside a git checkout (git_sha=None → "")
            # would prefix-match everything (r8 ADVICE). Spark times only
            # merge across the SAME sha (the engine changed otherwise)...
            # ...and never across a conf-A/B diagnostic row (bloom
            # forced off — same sha, different engine conf); its duck
            # times below are still valid (twin is conf-independent).
            if sha and e_sha and e_sha.startswith(sha[:len(e_sha)]) \
                    and e.get("queries") and not e.get("no_bloom"):
                n_inv += 1
                for k, v in e["queries"].items():
                    if k in art["queries"]:
                        art["queries"][k] = min(art["queries"][k], v)
            # ...but the DuckDB twin runs oracle SQL, which is pinned by
            # set_version — its minima merge across every invocation of
            # the set (the twin's time is engine-code-independent).
            # Seed-or-merge (r10): a SPARK_GRAFT_SKIP_DUCK invocation
            # overwrites the detail artifact with an EMPTY twin map, so
            # history is the only surviving twin evidence for the tier.
            # Only keys the artifact's own `queries` covers (r10 ADVICE):
            # SPARK_GRAFT_ONLY subsets all share set_version 'v2sub', so
            # an unguarded merge could seed twin keys from a DIFFERENT
            # subset, deflating the twin-covered ratio in Spark's favor.
            for k, v in (e.get("duckdb_twin_sec") or {}).items():
                if k not in art["queries"]:
                    continue
                cur = art["duckdb_twin_sec"].get(k)
                art["duckdb_twin_sec"][k] = v if cur is None else min(cur, v)
    art["n_merged_invocations"] = n_inv
    return art


def main() -> None:
    arts = {t: load(t) for t in TIERS}
    names = set(arts["0.1"]["queries"])
    for t in TIERS[1:]:
        names &= set(arts[t]["queries"])
    rows = sorted(names) if "--all" in sys.argv else [
        w for w in WATCH if w in names]

    hdr = "| query |" + "".join(
        f" sf{t} spark | duck | ratio |" for t in TIERS)
    sep = "|---|" + "---|---|---|" * len(TIERS)
    print(hdr)
    print(sep)
    for q in rows:
        cells = []
        for t in TIERS:
            s = arts[t]["queries"][q]
            d = arts[t]["duckdb_twin_sec"].get(q)
            r = f"{s / d:.2f}x" if d else "—"
            cells.append(f" {s:.3f} | {d if d else '—'} | {r} |")
        print(f"| {q} |" + "".join(cells))
    total = []
    for t in TIERS:
        a = arts[t]
        twin = a["duckdb_twin_sec"]
        # Totals over the SAME key set on both sides (r10 ADVICE): a twin
        # key absent from `queries` must not inflate d_tot.
        s_tot = sum(v for k, v in a["queries"].items() if k in twin)
        d_tot = sum(v for k, v in twin.items() if k in a["queries"])
        total.append(f" {s_tot:.1f} | {d_tot:.1f} | {s_tot / d_tot:.2f}x |")
    print("| **twin-covered total** |" + "".join(total))
    shas = {t: f"{arts[t].get('git_sha', '?')[:7]}"
               f"(n={arts[t]['n_merged_invocations']})" for t in TIERS}
    print(f"\nartifact shas: {shas}")


if __name__ == "__main__":
    main()
