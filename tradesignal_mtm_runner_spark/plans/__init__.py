"""Plan-inspection helpers: make 100 TB-readiness assertable.

Tests use these to pin the plan SHAPE, not just the results: filters
must reach the parquet scan (PushedFilters), scans must prune columns
(ReadSchema), small dims must broadcast, and per-symbol window chains
must cost exactly one shuffle. A regression in any of these is
invisible at sf0.001 and fatal at 100 TB — so it's tested like a
correctness bug.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain(mode) prints)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates pushed down to the scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (pruning check)."""
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", explain_str(df)))


def broadcast_hint_count(df: DataFrame) -> int:
    """EXPLICIT broadcast hints in the analyzed logical plan.

    Distinct from broadcast_join_count: a stats-driven broadcast (the
    side measured under autoBroadcastJoinThreshold, possibly by AQE at
    runtime) degrades gracefully when the relation grows, while an
    explicit ``F.broadcast()`` hint is honored unconditionally and
    OOMs the driver once the hinted side scales past memory. Tests pin
    this to 0 for any join side that grows with the data."""
    return len(
        re.findall(
            r"ResolvedHint \(strategy=broadcast\)",
            df._jdf.queryExecution().analyzed().toString(),
        )
    )


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    return len(
        re.findall(
            r"Arguments: (?:hash|range|RoundRobin)[Pp]artitioning",
            explain_str(df),
        )
    )


def executed_plan_str(df: DataFrame) -> str:
    """The FINAL physical plan — under AQE the pre-execution explain
    shows isFinalPlan=false and hides codegen, so this forces
    execution first."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans in the executed plan
    (executes the query)."""
    s = executed_plan_str(df)
    # toString marks codegen stages as "*(N) Operator"
    ids = re.findall(r"\*\((\d+)\)", s) + re.findall(r"WholeStageCodegen \((\d+)\)", s)
    return len(set(ids))
