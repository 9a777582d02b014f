#!/usr/bin/env python3
"""Evidence-rotation report: which ops' driver evidence is stale?

The external driver verifies ~50 ops per round in DRIVER_PRIORITY order
(registry.py). An op's evidence is STALE when the source file that
implements it changed in a commit AFTER the round that produced its most
recent CORRECTNESS_r*.json row — the engine the driver verified is no
longer the engine in the tree.

This script computes, for every registered op:
  - last_round: the newest round with a driver row for the op (0 = never)
  - impl file + the round-bucket of its last source change
  - stale: impl changed after the op's last driver row

and prints the rotation list: stale ops first (oldest evidence first),
then never-sampled ops, then fresh ops by evidence age. The top of this
list is what each round prepends to DRIVER_PRIORITY (after that round's
genuinely-new ops).

Usage:  python scripts/evidence_rotation.py [--limit N] [--json]
"""
from __future__ import annotations

import argparse
import bisect
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round_close_times() -> list[tuple[int, int]]:
    """[(round, unix_ts of the 'round N: verdict' commit)] ascending."""
    out = subprocess.run(
        ["git", "log", "--format=%ct %s"], cwd=REPO,
        capture_output=True, text=True, check=True).stdout
    rounds = []
    for line in out.splitlines():
        ts, _, subject = line.partition(" ")
        low = subject.lower()
        if low.startswith("round ") and ": verdict" in low:
            rounds.append((int(low.split()[1].rstrip(":")), int(ts)))
    return sorted(rounds)


def correctness_union() -> dict[str, int]:
    """op -> newest round with any driver row (hash or rows-only)."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for op_id in json.load(open(path)):
            last[op_id] = max(last.get(op_id, 0), rnd)
    return last


def impl_sites() -> dict[str, tuple[str, str]]:
    """op -> (repo-relative impl file, def name), from the registry."""
    from agentic_data_pipeline_spark import registry
    registry._ensure_loaded()
    out = {}
    for op_id, op in registry.OPS.items():
        mod = sys.modules[op.fn.__module__]
        out[op_id] = (os.path.relpath(mod.__file__, REPO), op.fn.__name__)
    return out


def last_change_ts(files: set[str]) -> dict[str, int]:
    """file -> unix ts of its last commit touching it."""
    out = {}
    for f in sorted(files):
        r = subprocess.run(["git", "log", "-1", "--format=%ct", "--", f],
                           cwd=REPO, capture_output=True, text=True)
        out[f] = int(r.stdout.strip() or 0)
    return out


def func_change_ts(sites: set[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """(file, func) -> unix ts of the last commit whose diff touched the
    FUNCTION BODY (git log -L :func:file with the python diff driver from
    .gitattributes). File-level staleness over-counts badly — an edit to
    one function marks every op in the file stale (r8: the q9/q15/q16/q21
    rewrites staleness-marked tpch_full.py's whole 22-op cohort). 0 when
    git can't resolve the function (decorated out, renamed): caller falls
    back to file granularity for that op."""
    out = {}
    for f, fn in sorted(sites):
        # Anchor to the exact def line: a bare name is a substring regex
        # over funcname lines, so e.g. ext_dedup_components resolved to
        # ext_dedup_components_star and tracked the wrong body (r9 advisor).
        r = subprocess.run(
            ["git", "log", "-1", "--format=%ct", f"-L:def {fn}(:{f}"],
            cwd=REPO, capture_output=True, text=True)
        first = r.stdout.splitlines()[0].strip() if r.stdout else ""
        out[(f, fn)] = int(first) if first.isdigit() else 0
    return out


def build_report():
    rounds = round_close_times()
    round_ts = [ts for _, ts in rounds]
    round_ids = [r for r, _ in rounds]

    def ts_to_round(ts: int) -> int:
        """Round bucket a commit timestamp falls in (commits after the
        round-N close belong to round N+1)."""
        i = bisect.bisect_left(round_ts, ts)
        return round_ids[-1] + 1 if i >= len(round_ids) else round_ids[i]

    evidence = correctness_union()
    sites = impl_sites()
    changes = last_change_ts({f for f, _ in sites.values()})
    fchanges = func_change_ts(set(sites.values()))

    rows = []
    for op_id, (f, fn) in sorted(sites.items()):
        last_round = evidence.get(op_id, 0)
        file_round = ts_to_round(changes[f])
        fts = fchanges[(f, fn)]
        func_round = ts_to_round(fts) if fts else None
        # Evidence round R was produced from code as of the round-R close;
        # a change committed in round R itself lands before that close and
        # IS covered, so stale means strictly-later change.
        # Two tiers (r8 verdict item 3): stale_func = the op's OWN def
        # changed after its last driver row (the real alarm); stale_file =
        # only the surrounding file changed (shared helpers may have moved
        # under it — softer signal, still worth rotating through).
        stale_func = (last_round > 0 and func_round is not None
                      and func_round > last_round)
        stale_file = (last_round > 0 and file_round > last_round
                      and not stale_func)
        rows.append({"op": op_id, "file": f, "func": fn,
                     "last_round": last_round,
                     "impl_changed_round": file_round,
                     "func_changed_round": func_round,
                     "stale": stale_func or stale_file,
                     "stale_func": stale_func, "stale_file": stale_file})

    def key(r):
        never = r["last_round"] == 0
        # stale_func (the op's OWN def changed after its last driver row)
        # and never-sampled stay the hard-alarm tiers. Below them,
        # EVIDENCE AGE is the primary order (r10 verdict item 3): ranking
        # every soft stale_file op ahead of fresh-file ops let ~56
        # stale_file rows (shared-helper churn, all sweep-green) starve
        # the r03-r05-evidence cohort out of the driver's ~50-op window
        # for four consecutive rounds. stale_file now breaks ties within
        # the same evidence round instead.
        tier = 0 if r["stale_func"] else 1 if never else 2
        return (tier, r["last_round"],
                0 if r["stale_file"] else 1, r["op"])

    rows.sort(key=key)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--priority", action="store_true",
                    help="emit the full DRIVER_PRIORITY tuple source, "
                         "driver_visible ops first in rotation order "
                         "(paste into registry.py at round close)")
    args = ap.parse_args()
    rows = build_report()
    if args.priority:
        from agentic_data_pipeline_spark import registry
        registry._ensure_loaded()
        # hidden ops go LAST (they can never earn a hash row; the ~50-op
        # budget window must be spent entirely on driver_visible ops)
        ordered = ([r["op"] for r in rows
                    if registry.OPS[r["op"]].driver_visible]
                   + [r["op"] for r in rows
                      if not registry.OPS[r["op"]].driver_visible])
        print("DRIVER_PRIORITY: tuple[str, ...] = (")
        for o in ordered:
            print(f'    "{o}",')
        print(")")
        return
    if args.limit:
        rows = rows[:args.limit]
    if args.json:
        json.dump(rows, sys.stdout, indent=1)
        return
    print(f"# ops={len(rows)} stale_func={sum(r['stale_func'] for r in rows)} "
          f"stale_file={sum(r['stale_file'] for r in rows)} "
          f"never={sum(r['last_round'] == 0 for r in rows)}")
    for r in rows:
        tag = ("FUNC!" if r["stale_func"] else
               "NEVER" if r["last_round"] == 0 else
               "file~" if r["stale_file"] else "fresh")
        fr = (f"fn_r{r['func_changed_round']:02d}"
              if r["func_changed_round"] else "fn_r??")
        print(f"{tag:5s} r{r['last_round']:02d} {fr} "
              f"chg_r{r['impl_changed_round']:02d} "
              f"{r['op']:38s} {r['file']}")


if __name__ == "__main__":
    main()
