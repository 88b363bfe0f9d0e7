"""Scale-up probe: does the flagship pipeline scale linearly in rows, and
does it parallelize across symbols?

Runs the distributed stock fixture + full feature pipeline (the BENCH
``stock_fe_671k`` point) at 1x / 3x / 10x the reference's 671,024-row scale,
on two symbol-cardinality axes:

- ``n_symbols=4`` (the reference's shape): the recursive per-symbol pass is
  parallelism-bound by |symbols| — the documented worst case;
- ``n_symbols=64``: the realistic many-key shape where the per-key pass
  spreads across the cluster.

Linear row-scaling (t ~ n) plus improving per-row time at higher symbol
counts is the evidence that the plan survives a 100x scale-up: no stage is
quadratic, and the only serialization axis widens with the keyspace.

Usage: python tools/scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 671_024
SCALES = (1, 3, 10)
SYMBOL_AXES = (4, 64)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json"

    from big_data_analysis_for_stock_market_data_spark import stock
    from big_data_analysis_for_stock_market_data_spark.session import get_session

    spark = get_session(app_name="scale_probe")
    # warm-up: JVM + codegen for the FE plan at tiny scale
    stock.feature_frame(
        stock.make_stock_fixture(spark, n_rows=10_000, n_symbols=4)
    ).write.format("noop").mode("overwrite").save()

    points = []
    for n_symbols in SYMBOL_AXES:
        for mult in SCALES:
            n_rows = BASE * mult
            t0 = time.time()
            bars = stock.make_stock_fixture(
                spark, n_rows=n_rows, n_symbols=n_symbols
            )
            feats = stock.feature_frame(bars)
            feats.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            points.append(
                {
                    "n_rows": n_rows,
                    "n_symbols": n_symbols,
                    "sec": round(dt, 2),
                    "us_per_row": round(dt / n_rows * 1e6, 3),
                }
            )
            print(json.dumps(points[-1]))

    with open(out_path, "w") as f:
        json.dump({"base_rows": BASE, "points": points}, f, indent=1)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
