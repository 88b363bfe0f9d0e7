"""Parse Spark physical plans into assertable facts.

Built on the same JVM entry point ``DataFrame.explain`` uses
(``PythonSQLUtils.explainString``), so what tests assert is exactly what a
user sees. Parsing is line-oriented and intentionally tolerant: Spark's
formatted output is stable enough across 3.x/4.x for the markers used here
(``PushedFilters:``, ``ReadSchema:``, ``Exchange``, join node names,
``codegen id``), all of which are public plan vocabulary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Python-executing physical nodes. ArrowEval/MapInPandas/FlatMapGroupsInPandas
#: are the engine's *sanctioned* vectorized crossings; BatchEvalPython is the
#: row-at-a-time path that must never appear in core operators.
PYTHON_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` prints, as a value."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates the scans received (``PushedFilters: [...]`` per scan,
    flattened). Empty list = nothing pushed — a red flag for any filtered
    columnar scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each file scan actually reads (``ReadSchema:``) — the
    ground truth for column pruning (a 2-column projection must not scan 16
    columns)."""
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        body = m.group(1).strip()
        cols = [f.split(":")[0].strip() for f in body.split(",")] if body else []
        out.append(cols)
    return out


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the (pre-AQE) physical plan — each is a full
    cluster-wide shuffle of its input. Broadcast exchanges are excluded:
    they move only the small side."""
    plan = explain_str(df, "simple")
    # \b keeps "BroadcastExchange" from matching: 'tE' is not a word boundary.
    return len(re.findall(r"\bExchange ", plan))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df, "simple")


def python_stages(df: DataFrame) -> list[str]:
    """Names of Python-executing nodes in the plan (see PYTHON_NODES).
    Core relational operators must return []; applyInPandas/mapInPandas
    operators must contain exactly their sanctioned node."""
    plan = explain_str(df, "simple")
    return [n for n in PYTHON_NODES if n in plan]


def codegen_ids(df: DataFrame) -> set[int]:
    """Distinct whole-stage-codegen span ids. More operators sharing one id
    = wider fused JVM loops; an expression pipeline that fragments into many
    spans (or none) has fallen off the fast path."""
    return {
        int(m.group(1))
        for m in re.finditer(r"codegen id : (\d+)", explain_str(df))
    }
