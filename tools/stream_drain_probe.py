"""A/B probe for the stateful streaming drain fixed cost (VERDICT r07
task 6): times ``stream_interval_full_join``'s drain at several
``state_partitions`` settings in ONE process, interleaved, and checks
the results are identical (state partitioning affects placement, never
values).

A stream-stream full-outer join opens FOUR state-store instances per
shuffle partition, and an availableNow drain pays two micro-batches
(data + watermark-eviction), each committing every instance (delta file
+ fsync). The probe isolates that per-instance fixed cost from the
(tiny at sf0.1) row-processing cost.

Usage: python tools/stream_drain_probe.py [sf_dir] [reps]
Writes STREAM_DRAIN_PROBE.json at the repo root.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from big_data_analysis_for_stock_market_data_spark import streaming as st
    from big_data_analysis_for_stock_market_data_spark.queries import (
        _events_stream,
    )
    from big_data_analysis_for_stock_market_data_spark.session import (
        get_session,
    )

    spark = get_session(app_name="stream_drain_probe")

    def build():
        ev = _events_stream(spark, sf_dir)
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        clicks = (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user_id"),
                F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"),
            )
        )
        lw = purchases.withWatermark("purchase_ts", "1 second")
        rw = clicks.withWatermark("click_ts", "1 second")
        return lw.join(
            rw,
            F.expr(
                "user_id = c_user_id AND click_ts >= purchase_ts "
                "AND click_ts <= purchase_ts + INTERVAL 1 HOUR"
            ),
            "full_outer",
        )

    def drain(n_parts):
        t0 = time.time()
        _, sink = st.run_to_memory(
            build(), output_mode="append", state_partitions=n_parts
        )
        dt = time.time() - t0
        rows = sorted(
            (
                str(r["purchase_id"]),
                str(r["click_id"]),
            )
            for r in spark.table(sink).collect()
        )
        h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
        spark.catalog.dropTempView(sink)
        return dt, len(rows), h

    settings = [8, 4, 2, 1]
    # warm-up drain (JVM + streaming machinery one-time cost)
    drain(8)
    out: dict[str, dict] = {}
    hashes = set()
    # interleave reps so host drift hits all settings equally
    times: dict[int, list[float]] = {n: [] for n in settings}
    for _ in range(reps):
        for n in settings:
            dt, nrows, h = drain(n)
            times[n].append(round(dt, 2))
            hashes.add((nrows, h))
    for n in settings:
        out[str(n)] = {
            "runs_sec": times[n],
            "min_sec": min(times[n]),
        }
    payload = {
        "sf_dir": sf_dir,
        "identical_results": len(hashes) == 1,
        "result": sorted(hashes)[0][0] if len(hashes) == 1 else list(hashes),
        "by_state_partitions": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_DRAIN_PROBE.json",
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
