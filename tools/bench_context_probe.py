"""Bench-context probe for stock FE/RF (VERDICT r08 task 5).

Question 1: where does stock_fe_671k's bench-context overhead go?
FE_STAGES measured 8.0-8.6 s solo-warm but the driver bench records
13.4 s. Hypotheses: (a) JVM/GC pressure accumulated over the 39 headline
queries that run first, (b) cached-block eviction churn, (c) plain host
drift. This probe runs, IN ONE PROCESS: calib -> FE x3 (fresh-session
arm) -> the full headline set once (recreating bench context) -> FE x3
(post-context arm) -> calib, capturing JVM GC-time deltas around each
arm via the GarbageCollectorMXBeans. Interleaving inside one process
means host drift hits both arms equally (r08 streaming-drain probe
method).

Question 2: is stock_rf_671k's 9.2 s irreducible Spark-ML training?
The probe times split/fit/evaluate separately (the bench's 9.2 s covers
all three) and A/Bs maxBins 16 vs 32 (reference parity value,
G_2_rf_rdd.py:163-164). If fit dominates and maxBins halving barely
moves it, the cost is treeAggregate training itself, not configuration.

Writes BENCH_CONTEXT_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STOCK_ROWS = 671_024


def gc_millis(spark) -> float:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return float(total)


def fe_once(spark, stock, hints) -> float:
    t0 = time.time()
    bars = stock.make_stock_fixture(spark, n_rows=STOCK_ROWS, n_symbols=4)
    feats = (
        stock.feature_frame(bars, **hints)
        .select("buy_or_sell", *stock.FEATURE_COLS)
        .na.drop(subset=stock.FEATURE_COLS)
        .cache()
    )
    feats.count()
    dt = time.time() - t0
    feats.unpersist()
    return dt


def fe_arm(spark, stock, hints, n=3) -> dict:
    gc0 = gc_millis(spark)
    runs = [round(fe_once(spark, stock, hints), 3) for _ in range(n)]
    return {"runs": runs, "min": min(runs), "gc_ms": gc_millis(spark) - gc0}


def rf_breakdown(spark, stock, ml, max_bins: int) -> dict:
    from pyspark.ml.classification import RandomForestClassifier

    from big_data_analysis_for_stock_market_data_spark.ml.metrics import (
        binary_metrics,
    )
    from big_data_analysis_for_stock_market_data_spark.ml.pipeline import (
        make_pipeline, strip_training_summaries,
    )

    bars = stock.make_stock_fixture(spark, n_rows=STOCK_ROWS, n_symbols=4)
    hints = stock.feature_hints(bars)
    feats = (
        stock.feature_frame(bars, **hints)
        .select("buy_or_sell", *stock.FEATURE_COLS)
        .na.drop(subset=stock.FEATURE_COLS)
        .cache()
    )
    feats.count()

    rf = RandomForestClassifier(
        labelCol="buy_or_sell", featuresCol="features",
        numTrees=10, maxDepth=10, maxBins=max_bins, seed=42,
    )
    pipeline = make_pipeline(rf, stock.FEATURE_COLS, "none", 12)

    t0 = time.time()
    train, test = feats.randomSplit([0.7, 0.3], seed=42)
    split_s = time.time() - t0  # lazy; cost lands in fit

    t0 = time.time()
    model = strip_training_summaries(pipeline.fit(train))
    fit_s = time.time() - t0

    t0 = time.time()
    predictions = model.transform(test).drop("__assembled", "__scaled")
    metrics = binary_metrics(predictions, label_col="buy_or_sell")
    eval_s = time.time() - t0

    feats.unpersist()
    return {
        "max_bins": max_bins,
        "split_sec": round(split_s, 3),
        "fit_sec": round(fit_s, 3),
        "eval_sec": round(eval_s, 3),
        "total_sec": round(split_s + fit_s + eval_s, 3),
        "n_metrics": len(metrics),
    }


def main() -> None:
    import bench
    from big_data_analysis_for_stock_market_data_spark import queries as registry
    from big_data_analysis_for_stock_market_data_spark import stock
    from big_data_analysis_for_stock_market_data_spark import ml
    from big_data_analysis_for_stock_market_data_spark.session import get_session

    spark = get_session(app_name="bench_context_probe")
    qs = registry.queries()

    # warm-up + hints once, exactly like bench.py
    qs[bench.HEADLINE[0]](spark, SF_DIR).count()
    bars = stock.make_stock_fixture(spark, n_rows=STOCK_ROWS, n_symbols=4)
    hints = stock.feature_hints(bars)

    calib0 = round(bench.bench_calibration(spark), 3)
    fresh = fe_arm(spark, stock, hints)

    # Recreate bench context: every headliner once (single run, noop sink).
    t0 = time.time()
    for name in bench.HEADLINE:
        if name in qs:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
    headline_context_sec = round(time.time() - t0, 3)

    post = fe_arm(spark, stock, hints)
    calib1 = round(bench.bench_calibration(spark), 3)

    rf32_a = rf_breakdown(spark, stock, ml, 32)
    rf16 = rf_breakdown(spark, stock, ml, 16)
    rf32_b = rf_breakdown(spark, stock, ml, 32)

    out = {
        "question_1_fe_context": {
            "calib_before": calib0,
            "fresh_arm": fresh,
            "headline_context_sec": headline_context_sec,
            "post_context_arm": post,
            "calib_after": calib1,
            "delta_min_sec": round(post["min"] - fresh["min"], 3),
            "delta_gc_ms": round(post["gc_ms"] - fresh["gc_ms"], 1),
        },
        "question_2_rf_breakdown": {
            "rf_maxbins32_run1": rf32_a,
            "rf_maxbins16": rf16,
            "rf_maxbins32_run2": rf32_b,
        },
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_CONTEXT_PROBE.json"),
            "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
