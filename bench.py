"""Benchmark harness (driver contract): runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count()-style action so results materialize
fully but never collect to the driver. One warm-up pass of the flagship query
absorbs JVM/codegen start-up so the numbers measure the plans, not the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_label_daily",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_nation_revenue",
    "w2_daily_lag_avg",
    "j2_daygrain_fanout",
    "dedup_exact_groups",
    "text_quality_stats",
    "simsearch_cosine_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from big_data_analysis_for_stock_market_data_spark import queries as registry
    from big_data_analysis_for_stock_market_data_spark.session import get_session

    spark = get_session(app_name="bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm-up: JVM, codegen, parquet footer caches.
    qs[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf  # type: ignore[assignment]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
