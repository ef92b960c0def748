"""Driver-side pipeline DSL: the orchestration semantics of the
reference's three schedulers (Celery canvas, Airflow DAG, Luigi targets)
as plain Python around Spark actions — SURVEY §2.11 C1-C11.

This is deliberately NOT a scheduler re-implementation: Spark already
parallelizes *inside* a stage, so stages execute sequentially in
dependency order on the driver, and a "group" fan-out is usually better
expressed as one DataFrame with the fan-out parameter as a column
(SURVEY §3.1 verdict on Celery groups). The DSL exists for the cases
that genuinely live outside one Catalyst plan: external ingestion with
retry, idempotent re-runs gated on materialized targets, branching, and
barrier callbacks.

Semantics ↔ reference:
  chain      C1 — requires=[...] (set_upstream, luigi requires())
  group      C2 — several stages sharing one downstream barrier
  chord      C3 — the barrier stage's fn sees all upstream results
  retry      C4 — retries/retry_delay with exponential backoff
               (celery self.retry, airflow retries+retry_delay)
  targets    C5 — target path + _SUCCESS marker ⇒ skip on re-run
               (luigi output() gating; Parquet's own _SUCCESS reused)
  dynamic    C6 — a stage returning Stages([...]) splices new stages
               (luigi yield DownloadTaxiFile(url))
  branch     C7 — a stage returning Branch(names) enables only those
               successors (airflow BranchPythonOperator)
  any_of     C9 — trigger="any" runs when ≥1 dependency succeeded
               (airflow trigger_rule='one_success')
  C8 subdag — a Pipeline is itself callable as a stage fn.
  C10/C11 (queues/rate limits, async handles) are scheduler concerns the
  engine intentionally leaves to Spark pools / streaming query handles.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

__all__ = ["Stage", "Stages", "Branch", "Pipeline", "PipelineError"]


class PipelineError(RuntimeError):
    pass


@dataclass
class Branch:
    """Returned by a branching stage: only these successors run (C7)."""
    selected: tuple[str, ...]

    def __init__(self, *names: str):
        object.__setattr__(self, "selected", tuple(names))


@dataclass
class Stages:
    """Returned by a stage to splice dynamic stages (C6)."""
    stages: Sequence["Stage"]


@dataclass
class Stage:
    name: str
    fn: Callable[[dict[str, Any]], Any]
    requires: tuple[str, ...] = ()
    target: str | None = None       # C5: skip when target is complete
    retries: int = 0                # C4
    retry_delay: float = 0.0        # C4: base backoff seconds (doubles)
    trigger: str = "all"            # "all" | "any" (C9)

    def target_complete(self) -> bool:
        if self.target is None:
            return False
        marker = os.path.join(self.target, "_SUCCESS")
        return os.path.exists(marker) or (
            os.path.exists(self.target) and not os.path.isdir(self.target))


class Pipeline:
    """Topologically ordered stage executor with target-gated idempotence.

    `run(ctx)` returns {stage_name: result}; statuses are in `.status`
    ("ok" | "skipped" | "gated" | "failed"). ctx is shared mutable state
    handed to every stage fn; upstream results appear in ctx["results"].
    """

    def __init__(self, *stages: Stage):
        self._stages: dict[str, Stage] = {}
        for s in stages:
            self.add(s)
        self.status: dict[str, str] = {}

    def add(self, stage: Stage) -> "Pipeline":
        if stage.name in self._stages:
            raise PipelineError(f"duplicate stage {stage.name!r}")
        self._stages[stage.name] = stage
        return self

    def _toposort(self) -> list[str]:
        order: list[str] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(n: str) -> None:
            if seen.get(n) == 1:
                return
            if seen.get(n) == 0:
                raise PipelineError(f"dependency cycle at {n!r}")
            seen[n] = 0
            for d in self._stages[n].requires:
                if d not in self._stages:
                    raise PipelineError(f"{n!r} requires unknown stage {d!r}")
                visit(d)
            seen[n] = 1
            order.append(n)

        for n in list(self._stages):
            visit(n)
        return order

    def _run_with_retry(self, stage: Stage, ctx: dict[str, Any]) -> Any:
        attempt = 0
        while True:
            try:
                return stage.fn(ctx)
            except Exception:
                if attempt >= stage.retries:
                    raise
                delay = stage.retry_delay * (2 ** attempt)
                if delay > 0:
                    time.sleep(delay)
                attempt += 1

    def run(self, ctx: dict[str, Any] | None = None) -> dict[str, Any]:
        ctx = ctx if ctx is not None else {}
        results: dict[str, Any] = ctx.setdefault("results", {})
        self.status = {}
        branch_filter: dict[str, set[str]] = {}  # branching stage -> allowed
        queue = self._toposort()
        i = 0
        while i < len(queue):
            name = queue[i]
            i += 1
            stage = self._stages[name]
            dep_status = [self.status.get(d, "ok") for d in stage.requires]
            dep_ok = ([s == "ok" or s == "gated" for s in dep_status] or [True])
            runnable = any(dep_ok) if stage.trigger == "any" else all(dep_ok)
            # C7: a branching upstream may have deselected this stage.
            for d in stage.requires:
                if d in branch_filter and name not in branch_filter[d]:
                    runnable = False
            if not runnable:
                self.status[name] = "skipped"
                continue
            if stage.target_complete():  # C5 idempotent re-run
                self.status[name] = "gated"
                continue
            try:
                result = self._run_with_retry(stage, ctx)
            except Exception as exc:
                self.status[name] = "failed"
                raise PipelineError(f"stage {name!r} failed: {exc}") from exc
            if isinstance(result, Branch):
                branch_filter[name] = set(result.selected)
                result = result.selected
            elif isinstance(result, Stages):  # C6 dynamic splice
                spliced = []
                for s in result.stages:
                    self.add(s)
                    spliced.append(s.name)
                # Insert right after the current stage, in order.
                queue[i:i] = spliced
                result = spliced
            results[name] = result
            self.status[name] = "ok"
        return results
