"""Orchestration DAG runner (reference SURVEY §2.10 D1-D4).

The reference drives its 7 Glue jobs with a Step Functions state machine
(scripts/stepfunction.json): Parallel branches for independent jobs, a strict
barrier between tiers (T0 -> T1 -> T2), and crawler poll-loops between stages.

Spark-first rebuild: a stage list where each stage is a set of callables run
concurrently (ThreadPoolExecutor -- Spark schedules jobs from multiple driver
threads just fine and FAIR-shares executors), with a barrier between stages.
Catalog registration is synchronous in-session, so the crawler poll-loop (D3)
collapses to a no-op hook.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field


@dataclass
class Stage:
    name: str
    tasks: list[tuple[str, Callable[[], object]]]


@dataclass
class Pipeline:
    """Ordered stages; tasks within a stage run in parallel, stages barrier."""

    stages: list[Stage] = field(default_factory=list)
    max_workers: int = 8

    def add_stage(self, name: str, **tasks: Callable[[], object]) -> "Pipeline":
        self.stages.append(Stage(name, list(tasks.items())))
        return self

    def run(self) -> dict[str, float]:
        """Execute; returns per-task wall seconds (keys 'stage.task')."""
        timings: dict[str, float] = {}
        for stage in self.stages:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                futs = {}
                for task_name, fn in stage.tasks:
                    start = time.perf_counter()
                    futs[pool.submit(fn)] = (f"{stage.name}.{task_name}", start)
                for fut in as_completed(futs):
                    key, start = futs[fut]
                    fut.result()  # propagate failures; barrier semantics
                    timings[key] = time.perf_counter() - start
        return timings
