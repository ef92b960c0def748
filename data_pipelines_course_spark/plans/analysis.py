"""Physical-plan introspection: the engine's `visualize()`/`explain` story.

The reference surfaces its plans as dask `visualize()` task graphs and a
`Profiler` (SURVEY §4.2 diagnostics row — `Chapter 4 - First Steps with
Dask.ipynb:163, :510-533`, `Chapter 4 - Learning Dask Bags.ipynb:185`).
Spark's equivalent is `df.explain("formatted")` plus the Spark UI; this
module turns that text into *checkable facts* so tests (and operators'
authors) can assert that the optimizations we rely on at 100 TB actually
fired:

  - predicate pushdown reached the parquet scan (``PushedFilters``),
  - column pruning reached the scan (``ReadSchema``),
  - partition pruning fired on partitioned layouts (``PartitionFilters``),
  - a join was planned broadcast vs sort-merge,
  - the hot path stayed inside WholeStageCodegen with no row-at-a-time
    Python eval,
  - how many shuffles (Exchange) a plan pays.

All helpers take a DataFrame and parse the formatted explain string — no
execution is triggered, so they are cheap enough to call in tests on
every headline query.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "scan_details",
    "pushed_filters",
    "partition_filters",
    "read_schema_columns",
    "join_strategies",
    "broadcast_hint_count",
    "exchange_count",
    "codegen_stage_count",
    "python_eval_nodes",
    "plan_report",
]


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain string for `df`'s physical plan (no execution)."""
    try:
        jvm = df.sparkSession.sparkContext._jvm
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode)
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def scan_details(df: DataFrame) -> list[dict[str, str]]:
    """One dict per file-scan node, keyed by the formatted-explain fields
    (Location, PushedFilters, PartitionFilters, ReadSchema, ...)."""
    plan = formatted_plan(df)
    scans: list[dict[str, str]] = []
    current: dict[str, str] | None = None
    for line in plan.splitlines():
        m = re.match(r"^\(\d+\) Scan ", line)
        if m:
            if current is not None:
                scans.append(current)
            current = {"node": line.strip()}
            continue
        if current is not None:
            f = re.match(r"^([A-Za-z ]+): (.*)$", line.strip())
            if f:
                current[f.group(1)] = f.group(2)
            elif re.match(r"^\(\d+\) ", line):
                scans.append(current)
                current = None
    if current is not None:
        scans.append(current)
    return scans


def _scan_field(df: DataFrame, field: str) -> list[str]:
    out: list[str] = []
    for scan in scan_details(df):
        raw = scan.get(field, "[]")
        out.extend(p.strip() for p in raw.strip("[]").split(",") if p.strip())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Data filters pushed into file scans, e.g. `IsNotNull(l_quantity)`."""
    return _scan_field(df, "PushedFilters")


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates applied at planning/runtime."""
    return _scan_field(df, "PartitionFilters")


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (column pruning evidence)."""
    cols: list[str] = []
    for scan in scan_details(df):
        schema = scan.get("ReadSchema", "")
        cols.extend(re.findall(r"(\w+):", schema))
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in plan order, e.g. `BroadcastHashJoin`."""
    plan = formatted_plan(df)
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct)\b", plan)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan.

    A `BroadcastHashJoin` in the physical plan can come from two places:
    Catalyst size statistics / AQE (safe — falls back to shuffle join
    when the side outgrows `autoBroadcastJoinThreshold`) or a hard
    `F.broadcast` hint (bypasses the size check; a forced OOM if the
    hinted side grows with the data). This counts only the latter, so
    tests can pin the policy: hints on fixed-cardinality dims ONLY."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes — the cost driver at 100 TB."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """WholeStageCodegen span count (>0 ⇒ the plan has fused JVM stages).

    An AQE plan only materializes its physical stages (and codegen
    fusion) at execution, so by default this collect()s the DataFrame to
    finalize ITS OWN QueryExecution (a noop write would execute a
    different one), then counts the `*(N)` fusion markers in the
    simple-mode explain. Only call with execute=True on frames whose
    result fits on the driver (aggregates/limits — true for tests);
    pass execute=False to inspect an already-executed frame."""
    if execute:
        df.collect()
    plan = formatted_plan(df, mode="simple")
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-execution nodes in the plan. Row-at-a-time `BatchEvalPython`
    is the 10-100× slow path; Arrow-batched nodes are the sanctioned
    escape hatch for the ops that genuinely need Python."""
    plan = formatted_plan(df)
    return re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
        r"|FlatMapGroupsInPandasWithState|MapInArrow)\b", plan)


def plan_report(df: DataFrame) -> dict[str, object]:
    """One-call summary used by tests and by humans at a REPL."""
    return {
        "pushed_filters": pushed_filters(df),
        "partition_filters": partition_filters(df),
        "read_schema_columns": read_schema_columns(df),
        "join_strategies": join_strategies(df),
        "exchange_count": exchange_count(df),
        "codegen_stages": codegen_stage_count(df, execute=False),
        "python_eval_nodes": python_eval_nodes(df),
    }
