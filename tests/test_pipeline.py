"""Pipeline-DSL tests (SURVEY §5.2 item 6): chain/group/chord, idempotent
re-run via targets, retry with backoff, branching, any-of triggers,
dynamic stages, subdag composition."""

from __future__ import annotations

import pytest

from data_pipelines_course_spark.plans.pipeline import (
    Branch, Pipeline, PipelineError, Stage, Stages,
)


def test_chain_and_chord_barrier():
    """C1/C2/C3 — group fan-out feeding a barrier that reduces all
    results (the Celery chord: header group + sort callback)."""
    calls = []

    def fetch(stock):
        def fn(ctx):
            calls.append(stock)
            return {"stock": stock, "price": len(stock)}
        return fn

    def barrier(ctx):
        rows = [ctx["results"][f"fetch_{s}"] for s in ("fb", "goog", "ibm")]
        return sorted(rows, key=lambda r: r["price"])

    p = Pipeline(
        Stage("fetch_fb", fetch("fb")),
        Stage("fetch_goog", fetch("goog")),
        Stage("fetch_ibm", fetch("ibm")),
        Stage("sorted", barrier, requires=("fetch_fb", "fetch_goog", "fetch_ibm")),
    )
    results = p.run()
    assert [r["stock"] for r in results["sorted"]] == ["fb", "ibm", "goog"]
    assert set(calls) == {"fb", "goog", "ibm"}


def test_idempotent_target_gating(tmp_path):
    """C5 — a completed target (_SUCCESS marker) makes the re-run a no-op."""
    out = tmp_path / "stage_out"
    runs = []

    def write(ctx):
        out.mkdir()
        (out / "_SUCCESS").touch()
        runs.append(1)

    p = Pipeline(Stage("write", write, target=str(out)))
    p.run()
    assert p.status["write"] == "ok"
    p2 = Pipeline(Stage("write", write, target=str(out)))
    p2.run()
    assert p2.status["write"] == "gated"
    assert len(runs) == 1


def test_retry_with_backoff():
    """C4 — flaky stage succeeds on attempt 2."""
    attempts = []

    def flaky(ctx):
        attempts.append(1)
        if len(attempts) < 2:
            raise OSError("transient")
        return "ok"

    p = Pipeline(Stage("flaky", flaky, retries=2, retry_delay=0.0))
    assert p.run()["flaky"] == "ok"
    assert len(attempts) == 2


def test_retry_exhaustion_fails():
    def always(ctx):
        raise OSError("down")

    p = Pipeline(Stage("always", always, retries=1, retry_delay=0.0))
    with pytest.raises(PipelineError, match="always"):
        p.run()
    assert p.status["always"] == "failed"


def test_branching_selects_one_path():
    """C7 — BranchPythonOperator semantics: only the chosen successor
    runs; the other is skipped, and skips cascade."""
    ran = []

    def mk(name):
        def fn(ctx):
            ran.append(name)
        return fn

    p = Pipeline(
        Stage("choose", lambda ctx: Branch("path_b")),
        Stage("path_a", mk("a"), requires=("choose",)),
        Stage("path_b", mk("b"), requires=("choose",)),
        Stage("after_a", mk("after_a"), requires=("path_a",)),
    )
    p.run()
    assert ran == ["b"]
    assert p.status["path_a"] == "skipped"
    assert p.status["after_a"] == "skipped"


def test_any_of_trigger():
    """C9 — trigger='any' (one_success) runs when one branch succeeded."""
    ran = []
    p = Pipeline(
        Stage("choose", lambda ctx: Branch("b")),
        Stage("a", lambda ctx: ran.append("a"), requires=("choose",)),
        Stage("b", lambda ctx: ran.append("b"), requires=("choose",)),
        Stage("cleanup", lambda ctx: ran.append("cleanup"),
              requires=("a", "b"), trigger="any"),
    )
    p.run()
    assert ran == ["b", "cleanup"]


def test_dynamic_stages():
    """C6 — a stage yields per-item stages discovered from data (luigi
    yield DownloadTaxiFile(url))."""
    downloaded = []

    def discover(ctx):
        urls = ["u1", "u2", "u3"]
        return Stages([
            Stage(f"download_{u}",
                  (lambda u: lambda ctx: downloaded.append(u))(u))
            for u in urls
        ])

    p = Pipeline(Stage("discover", discover))
    p.run()
    assert downloaded == ["u1", "u2", "u3"]
    assert p.status["download_u2"] == "ok"


def test_subdag_composition():
    """C8 — a Pipeline used as a stage fn."""
    inner = Pipeline(Stage("x", lambda ctx: 41))

    def run_inner(ctx):
        return inner.run()["x"] + 1

    outer = Pipeline(Stage("sub", run_inner))
    assert outer.run()["sub"] == 42


def test_cycle_detection():
    p = Pipeline(
        Stage("a", lambda ctx: None, requires=("b",)),
        Stage("b", lambda ctx: None, requires=("a",)),
    )
    with pytest.raises(PipelineError, match="cycle"):
        p.run()
