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


def impl_files() -> dict[str, str]:
    """op -> repo-relative impl file, from each registered fn's module."""
    from agentic_data_pipeline_spark import registry
    registry._ensure_loaded()
    out = {}
    for op_id, op in registry.OPS.items():
        mod = sys.modules[op.fn.__module__]
        out[op_id] = os.path.relpath(mod.__file__, REPO)
    return out


def last_change_ts(files: set[str]) -> dict[str, int]:
    """file -> unix ts of its last commit touching it."""
    out = {}
    for f in sorted(files):
        r = subprocess.run(["git", "log", "-1", "--format=%ct", "--", f],
                           cwd=REPO, capture_output=True, text=True)
        out[f] = int(r.stdout.strip() or 0)
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
    files = impl_files()
    changes = last_change_ts(set(files.values()))

    rows = []
    for op_id, f in sorted(files.items()):
        last_round = evidence.get(op_id, 0)
        changed_round = ts_to_round(changes[f])
        # Evidence round R was produced from code as of the round-R close;
        # a change committed in round R itself lands before that close and
        # IS covered, so stale means strictly-later change.
        stale = last_round > 0 and changed_round > last_round
        rows.append({"op": op_id, "file": f, "last_round": last_round,
                     "impl_changed_round": changed_round, "stale": stale})

    def key(r):
        never = r["last_round"] == 0
        return (0 if r["stale"] else (1 if never else 2),
                r["last_round"], r["op"])

    rows.sort(key=key)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    rows = build_report()
    if args.limit:
        rows = rows[:args.limit]
    if args.json:
        json.dump(rows, sys.stdout, indent=1)
        return
    n_stale = sum(r["stale"] for r in rows)
    print(f"# ops={len(rows)} stale={n_stale} "
          f"never={sum(r['last_round'] == 0 for r in rows)}")
    for r in rows:
        tag = "STALE" if r["stale"] else ("NEVER" if r["last_round"] == 0
                                          else "fresh")
        print(f"{tag:5s} r{r['last_round']:02d} chg_r{r['impl_changed_round']:02d} "
              f"{r['op']:38s} {r['file']}")


if __name__ == "__main__":
    main()
