"""Pipeline runner: named steps, per-step logging, single terminal action.

Replaces the reference's print-narrated ``main()`` (reference
ETL_pipeline.py:235-366) with a composable runner. Key behavioral
difference from the reference: steps build ONE lazy plan and the runner
triggers ONE terminal action (the sink) — the reference's
show()/show()/save() sequence executes its whole DAG three times
(SURVEY.md §3.4).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

log = logging.getLogger("c360.pipeline")


@dataclass
class Pipeline:
    """A named sequence of DataFrame -> DataFrame steps.

    >>> pipe = (Pipeline("interaction")
    ...         .step("clean", drop_sentinels_fn)
    ...         .step("features", feature_fn))
    >>> result = pipe.run(source_df)          # lazy: returns DataFrame
    >>> pipe.run_to(source_df, sink_fn)       # one terminal action
    """

    name: str
    steps: list[tuple[str, Callable[[DataFrame], DataFrame]]] = field(
        default_factory=list
    )

    def step(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        self.steps.append((name, fn))
        return self

    def run(self, df: DataFrame) -> DataFrame:
        """Compose all steps lazily; logs plan-build time per step (no
        jobs run here — Spark executes only at the sink/action)."""
        for step_name, fn in self.steps:
            t0 = time.perf_counter()
            df = fn(df)
            log.info(
                "[%s] step %-20s planned in %.3fs",
                self.name,
                step_name,
                time.perf_counter() - t0,
            )
        return df

    def run_to(self, df: DataFrame, sink: Callable[[DataFrame], None]) -> None:
        """Compose and execute with ONE terminal action."""
        out = self.run(df)
        t0 = time.perf_counter()
        sink(out)
        log.info("[%s] sink executed in %.3fs", self.name, time.perf_counter() - t0)
