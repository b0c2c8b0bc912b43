"""Plan-inspection utilities: assert that a DataFrame's physical plan has
the shape the engine intends (pushdown reached the scan, dims broadcast,
no Python row-at-a-time evaluation, bounded exchange count).

These exist because "the query returns the right rows" does not prove
"the plan survives 100×the data". The test suite runs these assertions on
the headline queries so a regression that silently turns a broadcast join
into a shuffled SMJ, or drops a filter below the scan, fails CI — not the
cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\n\(\d+\) Exchange", plan))


def count_broadcasts(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"BroadcastExchange", plan))


def has_pushed_filters(df: DataFrame) -> bool:
    """True if at least one parquet scan carries pushed filters."""
    plan = formatted_plan(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — verifies column pruning."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", plan)


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True if Catalyst injected a runtime bloom-filter join reduction
    (bloom_filter_agg on the creation side + might_contain on the
    application side). At production scale this fires under the default
    thresholds (creation side < 10 MB after filtering, application-side
    scan > 10 GB); local test data sits below the application-side
    threshold, so the plan test lowers it to prove the machinery."""
    plan = formatted_plan(df)
    return "bloom_filter_agg" in plan and "might_contain" in plan


def has_partition_filters(df: DataFrame) -> bool:
    """True if at least one scan prunes directories via a non-empty
    PartitionFilters list (date/bucket-partitioned layouts)."""
    plan = formatted_plan(df)
    return bool(re.search(r"PartitionFilters: \[(?!\])", plan))


def count_scans_of(df: DataFrame, path_token: str) -> int:
    """How many parquet scans of a given file/table the plan contains —
    pins 'this fact table is read exactly once' (a scalar-subquery
    crossJoin silently doubles the scan)."""
    plan = formatted_plan(df)
    return len(
        [
            m
            for m in re.findall(r"Location: \w+ ?\[[^\]]*\]", plan)
            if path_token in m
        ]
    )


def uses_python_row_udf(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python evaluation
    (BatchEvalPython). Arrow-batched eval (ArrowEvalPython / mapInPandas)
    is allowed; plain UDFs in a hot path are not."""
    return "BatchEvalPython" in simple_plan(df)


def has_single_partition_exchange(df: DataFrame) -> bool:
    """True if the plan funnels data through ONE partition (global sort /
    partition-less window) — the canonical 100 TB scale-killer. Registered
    queries must never carry one."""
    return "Exchange SinglePartition" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (explain mode 'codegen' —
    the AQE formatted plan hides the spans before execution)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
