"""Physical-plan inspection helpers — used by tests and bench to assert the
plan properties the 100 TB story depends on (pushdown reached the scan, the
dim join broadcast, codegen covers the pipeline). The reference gets these
properties from its storage layout (README.md:8,10); we assert Catalyst
actually delivers them."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema of the first scan)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema_part = line.split("ReadSchema:", 1)[1].strip()
            inner = schema_part.split("<", 1)[1].rsplit(">", 1)[0]
            cols = []
            depth = 0
            cur = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(cur.split(":")[0].strip())
                    cur = ""
                else:
                    cur += ch
            if cur:
                cols.append(cur.split(":")[0].strip())
            return cols
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")
