"""Physical-plan introspection: the engine's scale guarantees (pushdown,
pruning, broadcast, shuffle count) as a queryable API instead of folk
knowledge.

``tests/test_plans.py`` pins the registered queries' shapes with these
helpers; user pipelines can do the same in their own CI — a plan
regression (a lost pushdown, a join degrading to cartesian, a second
scan appearing) is a silent 100 TB incident that a row-count test will
never catch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (without printing to stdout)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def plan_stats(df: DataFrame) -> dict[str, int]:
    """Count the plan features that matter at scale. Keys:

    - ``scans``: parquet scans (one per `(n) Scan parquet` node — a
      query that logically reads a table once but shows 2 scans is
      re-reading it);
    - ``hash_exchanges`` / ``range_exchanges`` / ``single_exchanges``:
      data-moving shuffles by partitioning (range = global sort,
      single = everything to one task — both red flags on big data);
    - ``broadcast_joins`` / ``sort_merge_joins`` / ``shuffled_hash_joins``
      / ``nested_loop_joins`` / ``cartesian``: join strategies chosen;
    - ``pushed_filter_scans``: scans that received at least one pushed
      filter;
    - ``codegen_spans``: whole-stage codegen regions (wider is better).
    """
    text = plan_text(df)
    return {
        "scans": len(re.findall(r"\(\d+\) Scan parquet", text)),
        "hash_exchanges": text.count("hashpartitioning"),
        "range_exchanges": text.count("rangepartitioning"),
        "single_exchanges": text.count("SinglePartition"),
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", text)),
        "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", text)),
        "shuffled_hash_joins": len(
            re.findall(r"\(\d+\) ShuffledHashJoin", text)
        ),
        "nested_loop_joins": len(
            re.findall(r"\(\d+\) BroadcastNestedLoopJoin", text)
        ),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", text)),
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[[^\]]", text)
        ),
        # best-effort: an AdaptiveSparkPlan that hasn't executed yet
        # reports 0 codegen subtrees (AQE finalizes codegen per stage
        # at runtime) — run an action first if you need this metric
        "codegen_spans": int(
            re.search(
                r"Found (\d+) WholeStageCodegen", plan_text(df, "codegen")
            ).group(1)
        ),
    }


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ReadSchema — the columns actually read from disk.
    A scan reading columns the query never uses means pruning failed."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_text(df))
