"""Engine operators (SURVEY.md §2 inventory + north-star extensions).

- ``windows``    : lead/lag label construction, rolling frames (W1-W4)
- ``aggregates`` : grouped aggregates, quality scans, moments (A1-A7)
- ``joins``      : equi-joins and the join-or-fuse builder (J1-J3, Q4)
- ``indicators`` : native technical-indicator computation (SMA/EMA/RSI/...)
- ``dedup``      : exact + near-duplicate detection (MinHash, SimHash, ...)
- ``simsearch``  : cosine similarity / ANN over embedding columns
- ``text``       : language-ID, quality scoring, token counts, fingerprints
- ``multimodal`` : opaque-binary media columns with Pandas-UDF stages
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen compute-dense pipelines to the session's parallelism.

    Per-row hashing, shingling, and vector math are CPU-bound, not IO-bound:
    a small input arriving as one or two file splits would serialize the
    whole pipeline on one core (observed 32x slowdown on a single-file
    corpus). Round-robin repartitioning the small input costs a negligible
    shuffle and buys full compute width. No-op when the scan already yields
    enough partitions — the 100 TB case, where adding a shuffle would be
    the bug instead."""
    sess = df.sparkSession
    target = int(
        min_partitions or sess.conf.get("spark.sql.shuffle.partitions")
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
