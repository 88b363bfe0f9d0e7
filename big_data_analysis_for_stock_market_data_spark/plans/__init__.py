"""Physical-plan inspection (SURVEY.md §4).

The reference never looked at a plan; at 100 TB the plan IS the product.
These helpers turn `.explain("formatted")` into assertable facts so tests
pin the *plan shape* — filters reaching the parquet scan, dims broadcast,
scans pruned to the referenced columns, Python confined to sanctioned
stages — not just result values. A correct result off a wrong plan is a
regression waiting for scale.
"""

from big_data_analysis_for_stock_market_data_spark.plans.inspect import (
    codegen_ids,
    count_shuffles,
    explain_str,
    has_broadcast_hash_join,
    has_sort_merge_join,
    pushed_filters,
    python_stages,
    read_schemas,
)

__all__ = [
    "codegen_ids",
    "count_shuffles",
    "explain_str",
    "has_broadcast_hash_join",
    "has_sort_merge_join",
    "pushed_filters",
    "python_stages",
    "read_schemas",
]
