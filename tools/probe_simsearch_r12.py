"""r12 probe: interleaved A/B of the simsearch candidate-dedup formulations
(host-burst protocol: both variants in one session, alternating, min-of-N).

Variants for the ann_join shape (the regressed simsearch_ann_auto_planes
path is this operator at n_planes='auto'):

  A (shipped r11): bucket join -> distinct() over (ids + BOTH 64-float
    vectors) -> cosine -> rank.  HashAggregate keys carry the vectors.
  B (candidate):   bucket join -> cosine -> distinct() over
    (left_id, neighbor_id, cos_sim) -> rank.  Fixed-width keys only; the
    vectors never cross the post-join aggregation.

Usage: python tools/probe_simsearch_r12.py [reps] [auto|fixed]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mode = sys.argv[2] if len(sys.argv) > 2 else "auto"

    from big_data_analysis_for_stock_market_data_spark.operators import (
        simsearch as ss,
    )
    from big_data_analysis_for_stock_market_data_spark.session import get_session
    from big_data_analysis_for_stock_market_data_spark.sources.io import (
        read_parquet,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe_simsearch_r12")
    emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))

    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    n_planes = (
        ss.resolve_n_planes("auto", right) if mode == "auto" else 6
    )
    print(f"n_planes={n_planes} corpus_rows(right)={right.count()}")

    def bucketed(df, idn, vecn):
        return ss.ensure_parallelism(df).select(
            F.col("vec_id").alias(idn),
            F.col("embedding").alias(vecn),
            F.explode(
                F.array(*[ss._bucket_expr(F.col("embedding"), t, n_planes, 64,
                                          plane_mode="axis")
                          for t in range(8)])
            ).alias("__bucket"),
        )

    def variant_a():
        l_b = bucketed(left, "__lid", "__lvec")
        r_b = bucketed(right, "__rid", "__rvec")
        cand = (
            l_b.join(r_b, "__bucket")
            .filter(F.col("__lid") != F.col("__rid"))
            .select("__lid", "__lvec", "__rid", "__rvec")
            .distinct()
        )
        cos = F.round(ss.cosine(F.col("__lvec"), F.col("__rvec")), 6)
        scored = cand.select(
            F.col("__lid").alias("left_id"),
            F.col("__rid").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        w = Window.partitionBy("left_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .orderBy("left_id", "rank")
        )

    def variant_b():
        l_b = bucketed(left, "__lid", "__lvec")
        r_b = bucketed(right, "__rid", "__rvec")
        cos = F.round(ss.cosine(F.col("__lvec"), F.col("__rvec")), 6)
        scored = (
            l_b.join(r_b, "__bucket")
            .filter(F.col("__lid") != F.col("__rid"))
            .select(
                F.col("__lid").alias("left_id"),
                F.col("__rid").alias("neighbor_id"),
                cos.alias("cos_sim"),
            )
            .distinct()
        )
        w = Window.partitionBy("left_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
            .orderBy("left_id", "rank")
        )

    # result equivalence check first (cheap at any sf)
    ra = variant_a().collect()
    rb = variant_b().collect()
    assert ra == rb, f"variants disagree: {len(ra)} vs {len(rb)} rows"
    print(f"equivalence: OK ({len(ra)} rows)")

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    times: dict[str, list[float]] = {"A_vec_keys": [], "B_narrow_keys": []}
    # warm both once
    run(variant_a()); run(variant_b())
    for _ in range(reps):
        times["A_vec_keys"].append(round(run(variant_a()), 3))
        times["B_narrow_keys"].append(round(run(variant_b()), 3))
    out = {
        "mode": mode, "n_planes": n_planes, "reps": reps,
        "cpus": spark.sparkContext.defaultParallelism,
        "runs": times,
        "min": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
