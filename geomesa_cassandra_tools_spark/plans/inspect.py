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


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans, read from the EXECUTED plan —
    under AQE the pre-execution plan is provisional and carries no `*(n)`
    codegen markers, so this materializes the frame (noop sink) first."""
    df.collect()  # finalize THIS frame's own query execution (a sink write
    # would execute a copy and leave df's AQE plan provisional)
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    return plan.count("*(")
