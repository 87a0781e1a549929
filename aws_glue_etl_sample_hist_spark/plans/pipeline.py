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
    """Ordered stages; tasks within a stage run in parallel, stages barrier.

    ``retries``/``retry_backoff_s`` mirror the reference state machine's
    per-state Retry blocks: a failing task is re-attempted in place before
    the failure propagates and aborts the stage barrier.
    """

    stages: list[Stage] = field(default_factory=list)
    max_workers: int = 8
    retries: int = 0
    retry_backoff_s: float = 1.0

    def add_stage(self, name: str, **tasks: Callable[[], object]) -> "Pipeline":
        self.stages.append(Stage(name, list(tasks.items())))
        return self

    def _run_task(self, fn: Callable[[], object]) -> float:
        """Run with retries; returns the task's OWN wall seconds -- timed
        around fn() inside the worker, so queue wait (tasks > max_workers)
        and completion-observation delay are never charged to the task."""
        attempt = 0
        while True:
            start = time.perf_counter()
            try:
                fn()
                return time.perf_counter() - start
            except Exception:
                attempt += 1
                if attempt > self.retries:
                    raise
                time.sleep(self.retry_backoff_s * (2 ** (attempt - 1)))

    def run(self) -> dict[str, float]:
        """Execute; returns per-task wall seconds (keys 'stage.task')."""
        timings: dict[str, float] = {}
        for stage in self.stages:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                futs = {
                    pool.submit(self._run_task, fn): f"{stage.name}.{task_name}"
                    for task_name, fn in stage.tasks
                }
                for fut in as_completed(futs):
                    timings[futs[fut]] = fut.result()  # propagate failures; barrier
        return timings
