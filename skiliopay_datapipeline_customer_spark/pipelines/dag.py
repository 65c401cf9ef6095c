"""Deterministic task-graph orchestrator — the engine-side counterpart of
the reference's Airflow DAG (/root/reference/dags/churn_prediction_pipeline.py:
27-48 default_args/retries, 222-308 task wiring and trigger rules).

The reference orchestrates eight PythonOperators with ``retries=2`` /
``retry_delay``, XCom result passing (``ti.xcom_pull(task_ids=...)``),
parallel fan-out after ``process_data``, and two EmailOperator terminals
gated by ``trigger_rule='all_success'`` / ``'one_failed'``. This module
re-expresses that surface as a small dependency-ordered runner:

- ``Task`` = id + callable + per-task retry policy + trigger rule. The
  callable receives a ``results`` mapping (task_id -> returned value) — the
  XCom equivalent, but explicit and typed instead of a metadata side-channel.
- ``Dag.run`` executes in deterministic topological order (Kahn's algorithm
  with lexicographic tie-break, so reruns schedule identically), retries
  failed tasks with an injectable sleeper (tests run delay-free), marks
  downstream of a failure ``upstream_failed`` without running it, and fires
  ``one_failed`` terminals exactly when Airflow would.
- One run at a time per Dag object (``max_active_runs=1`` is the only mode);
  ``catchup=False`` is inherent — a run is a plain function call, there is
  no schedule backlog to replay.

Driver-only by design: tasks typically submit Spark actions, so the
orchestrator thread does bookkeeping while the cluster does the work —
exactly Airflow's division of labor, minus the scheduler daemon. State for
a run lives in the returned ``DagRun`` (per-task state/attempts/results),
which is what the reference reads back out of the Airflow metadata DB.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

ALL_SUCCESS = "all_success"
ONE_FAILED = "one_failed"

# terminal task states (mirrors airflow's TaskInstanceState vocabulary)
SUCCESS = "success"
FAILED = "failed"
UPSTREAM_FAILED = "upstream_failed"
SKIPPED = "skipped"


@dataclass
class Task:
    """One unit of work. ``fn(results)`` gets the finished tasks' returned
    values keyed by task_id — the explicit form of ``xcom_pull``."""

    task_id: str
    fn: Callable[[Mapping[str, Any]], Any]
    retries: int = 0
    retry_delay_s: float = 0.0
    trigger_rule: str = ALL_SUCCESS

    def __post_init__(self) -> None:
        if self.trigger_rule not in (ALL_SUCCESS, ONE_FAILED):
            raise ValueError(f"unknown trigger_rule: {self.trigger_rule}")


@dataclass
class TaskState:
    state: str
    attempts: int = 0
    error: str | None = None


@dataclass
class DagRun:
    """The run record the reference keeps in Airflow's metadata DB."""

    states: dict[str, TaskState] = field(default_factory=dict)
    results: dict[str, Any] = field(default_factory=dict)
    order: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(
            s.state in (SUCCESS, SKIPPED)
            for tid, s in self.states.items()
        )


class Dag:
    def __init__(self, dag_id: str, sleeper: Callable[[float], None] = time.sleep):
        self.dag_id = dag_id
        self._tasks: dict[str, Task] = {}
        self._upstream: dict[str, set[str]] = {}
        self._sleeper = sleeper
        self._running = False

    def add(self, task: Task, upstream: list[str] | None = None) -> "Dag":
        if task.task_id in self._tasks:
            raise ValueError(f"duplicate task_id: {task.task_id}")
        for up in upstream or []:
            if up not in self._tasks:
                raise ValueError(f"unknown upstream task: {up}")
        self._tasks[task.task_id] = task
        self._upstream[task.task_id] = set(upstream or [])
        return self

    def _topo_order(self) -> list[str]:
        """Kahn's algorithm, smallest-id-first — a stable total order so two
        runs of the same graph schedule identically (the determinism Airflow
        gets from its scheduler loop, here by construction). ``add``'s
        known-upstream check already rules out cycles (edges only point at
        previously added tasks), so every task drains."""
        remaining = {tid: set(ups) for tid, ups in self._upstream.items()}
        order: list[str] = []
        while remaining:
            ready = sorted(t for t, ups in remaining.items() if not ups)
            tid = ready[0]
            order.append(tid)
            del remaining[tid]
            for ups in remaining.values():
                ups.discard(tid)
        return order

    def _run_task(self, task: Task, run: DagRun) -> None:
        st = run.states[task.task_id]
        for attempt in range(task.retries + 1):
            st.attempts = attempt + 1
            try:
                run.results[task.task_id] = task.fn(run.results)
                st.state = SUCCESS
                st.error = None
                return
            except Exception as exc:  # noqa: BLE001 — orchestrator boundary
                st.error = f"{type(exc).__name__}: {exc}"
                if attempt < task.retries and task.retry_delay_s > 0:
                    self._sleeper(task.retry_delay_s)
        st.state = FAILED

    def run(self) -> DagRun:
        """Execute the graph. ``all_success`` tasks run iff every upstream
        succeeded (else ``upstream_failed``); ``one_failed`` terminals run
        iff at least one upstream failed (else ``skipped``) — and they run
        even when their other upstreams never executed, matching Airflow's
        rule that ``one_failed`` needs one failure, not all-done-successfully.
        """
        if self._running:
            raise RuntimeError(f"dag {self.dag_id} already has an active run")
        self._running = True
        try:
            run = DagRun(
                states={tid: TaskState(state=SKIPPED) for tid in self._tasks}
            )
            for tid in self._topo_order():
                task = self._tasks[tid]
                ups = [run.states[u] for u in self._upstream[tid]]
                any_bad = any(
                    u.state in (FAILED, UPSTREAM_FAILED) for u in ups
                )
                if task.trigger_rule == ONE_FAILED:
                    if not any_bad:
                        continue  # stays SKIPPED
                elif any_bad:
                    run.states[tid].state = UPSTREAM_FAILED
                    continue
                elif any(u.state == SKIPPED for u in ups):
                    continue  # skip cascades through all_success tasks
                run.order.append(tid)
                self._run_task(task, run)
            return run
        finally:
            self._running = False
