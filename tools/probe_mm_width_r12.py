"""r12 probe: Python fan-out width sweep for the multimodal family
(interleaved across widths, min-of-N — host-burst protocol).

The real operators are used unmodified; the widening target is varied via
``spark.sql.shuffle.partitions`` (ensure_parallelism's target), which is
exactly what distinguishes the driver's 8-core run (shuffle.partitions=8,
mm_container_headers 1.2 s) from its 32-core run (32, 4.3 s) apart from
task slots. Pipelines:

  containers: the mm_container_headers shape (synth -> parse -> orderBy)
  wav:        the codec-entry shape (distinct ids -> fused synth+decode)

Usage: python tools/probe_mm_width_r12.py [reps] [w1,w2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    widths = (
        [int(w) for w in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [1, 2, 4, 8, 16, 32]
    )

    from big_data_analysis_for_stock_market_data_spark.operators import (
        multimodal as mm,
    )
    from big_data_analysis_for_stock_market_data_spark.session import get_session
    from big_data_analysis_for_stock_market_data_spark.sources.io import (
        read_parquet,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe_mm_width_r12")
    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    users = read_parquet(
        spark, os.path.join(sf_dir, "events.parquet")
    ).select("user_id").distinct()
    n_docs, n_users = docs.count(), users.count()
    print(f"docs={n_docs} users={n_users} "
          f"cpus={spark.sparkContext.defaultParallelism}")

    def containers():
        synth = mm.synthesize_containers(docs, id_col="doc_id")
        return mm.parse_container_headers(
            synth, id_col="doc_id"
        ).orderBy("doc_id")

    def wav():
        return mm.wav_roundtrip_stats(users, id_col="user_id").orderBy(
            "user_id"
        )

    def run_at(build, w: int) -> float:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(w))
        try:
            df = build()  # ensure_parallelism reads the conf at build time
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    # warm all plans once
    for w in widths:
        run_at(containers, w); run_at(wav, w)

    out: dict[str, dict[int, list[float]]] = {"containers": {}, "wav": {}}
    for _ in range(reps):
        for w in widths:
            out["containers"].setdefault(w, []).append(
                round(run_at(containers, w), 3))
            out["wav"].setdefault(w, []).append(round(run_at(wav, w), 3))
    print(json.dumps({
        "reps": reps, "widths": widths,
        "runs": out,
        "min": {k: {w: min(v) for w, v in d.items()} for k, d in out.items()},
    }))


if __name__ == "__main__":
    main()
