"""Physical-plan inspection helpers — the feedback loop for keeping every
operator inside Catalyst/Tungsten (pushdown reaching the scan, whole-stage
codegen, no accidental Python in the hot path). Used by tests to make plan
quality a regression-checked property, not a hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the formatted plan (empty string if the
    scan got nothing pushed — a smell for any filtered parquet read)."""
    plan = explain_str(df, "formatted")
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def assert_no_python_udf(df: DataFrame) -> None:
    plan = explain_str(df, "formatted")
    for marker in ("BatchEvalPython", "PythonUDF"):
        if marker in plan:
            raise AssertionError(f"Python UDF in hot path:\n{plan}")


def scan_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Executed-plan metrics of every parquet scan node — the ground truth
    for storage-pruning claims (`numOutputRows` is what the reader actually
    decoded AFTER pushed-filter row-group/record skipping; a "pushed" filter
    that still decodes every row is pruning in name only). Materializes the
    frame via collect() — a WRAPPING action (count()) builds its own query
    execution and leaves THIS frame's AQE plan provisional with zeroed
    metrics, so collect is the only faithful trigger. Test-utility
    contract: call it on SMALL frames only (aggregates/limits), never on a
    corpus-sized or binary-payload frame."""
    df.collect()

    out: list[dict[str, int]] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        if "Scan" in name and "parquet" in name.lower():
            vals: dict[str, int] = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())  # type: ignore[attr-defined]
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of DISTINCT whole-stage-codegen spans, read from the EXECUTED
    plan — under AQE the pre-execution plan is provisional and carries no
    `*(n)` codegen markers, so this materializes the frame first. Every
    operator inside a span prints the same `*(id)` prefix, so the span
    count is the count of distinct ids, not of `*(` occurrences."""
    import re

    df.collect()  # finalize THIS frame's own query execution (a wrapping
    # count()/sink write would execute a copy and leave it provisional)
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
