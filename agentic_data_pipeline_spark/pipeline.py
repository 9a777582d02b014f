"""Pipeline orchestration (reference app.py's 6-stage wizard, engine-side).

The reference drives "Ingestion → Storage (Delta) → Indexing → Staging &
Wrangles → Transformation → Serving" (app.py:60) as a Streamlit state
machine: integer ``current_step`` + append-only ``logs`` in session state
(app.py:44-52). This module is that state machine without the UI: named
stages over an immutable DataFrame hand-off, an append-only log, and
fail-stop semantics (the reference instead try/except-logs per stage,
app.py:98-100 — we keep the log but re-raise, because a silently-skipped
stage in a 100 TB pipeline is corrupted output downstream).

Orchestration stays thin on purpose: each stage is a plain
``DataFrame -> DataFrame`` callable, so the *stages* are the tested units
(operators/), and the pipeline contributes only sequencing, logging, and
names — no engine logic hides here.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]


@dataclass
class StageRun:
    name: str
    seconds: float
    rows_hint: int | None = None  # filled only if count_rows=True (extra job)


@dataclass
class Pipeline:
    """Linear named-stage pipeline with the reference's run-state surface."""

    stages: list[tuple[str, StageFn]] = field(default_factory=list)
    logs: list[str] = field(default_factory=list)
    current_step: int = 0  # mirrors app.py:44-47

    def add_stage(self, name: str, fn: StageFn) -> "Pipeline":
        self.stages.append((name, fn))
        return self

    def log(self, message: str) -> None:
        self.logs.append(message)  # append-only (app.py:51-52)

    def run(self, df: DataFrame, count_rows: bool = False) -> DataFrame:
        """Run every stage in order; returns the final DataFrame.

        Stage hand-off is lazy (a DataFrame is a plan, not data) — the whole
        pipeline collapses into one Catalyst plan unless a stage forces an
        action, so "6 stages" does not mean 6 jobs.
        """
        self.current_step = 0
        self.runs: list[StageRun] = []
        for name, fn in self.stages:
            t0 = time.perf_counter()
            try:
                df = fn(df)
            except Exception as e:
                self.log(f"FAILED {name}: {e}")
                raise
            rows = df.count() if count_rows else None
            self.runs.append(StageRun(name, time.perf_counter() - t0, rows))
            self.current_step += 1
            self.log(f"OK {name} ({self.current_step}/{len(self.stages)})")
        return df
