"""Dedup scale probe: does MinHash-LSH candidate generation stay SPARSE
as the corpus grows?

The 100 TB risk in near-dup pipelines is the candidate set: naive
all-pairs is |corpus|², and a bad banding curve (see the reverted r=2
experiment) degrades toward it. This probe generates a synthetic corpus
with a fixed near-duplicate fraction (1 in 7 documents is a 29/30-token
copy of its predecessor; all tokens drawn from a shared 800-word vocab so
the inverted structures face realistic collision pressure) at 1x / 3x /
10x, and records:

- LSH candidate pairs per document (flat => linear candidate growth);
- verified near-dup pairs per document (should track the planted rate);
- end-to-end seconds and µs/document.

Flat candidates/doc + flat µs/doc is the evidence the pipeline is linear
in corpus size, i.e. the banding + bucket-cap design holds at 100x.

Usage: python tools/dedup_scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 5_000
SCALES = (1, 3, 10)
N_TOKENS = 30
VOCAB = 800


def synth_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # every 7th doc copies its predecessor's token stream except token 0
    base = F.when(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", base.cast("string"), j.cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % VOCAB
        ).cast("string"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
        lambda j: F.when(
            (j == 0) & (F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0),
            F.concat(F.lit("uniq"), F.col("doc_id").cast("string")),
        ).otherwise(tok(j)),
    )
    return ids.select("doc_id", F.concat_ws(" ", words).alias("text"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "DEDUP_SCALE_PROBE.json"

    from big_data_analysis_for_stock_market_data_spark.operators import dedup as dd
    from big_data_analysis_for_stock_market_data_spark.operators import (
        ensure_parallelism,
    )
    from big_data_analysis_for_stock_market_data_spark.session import get_session

    spark = get_session(app_name="dedup_scale_probe")
    # warm-up
    dd.minhash_near_dups(synth_corpus(spark, 500)).count()

    points = []
    for mult in SCALES:
        n_docs = BASE * mult
        corpus = synth_corpus(spark, n_docs)

        # candidate-stage cardinality (the quantity that must stay linear)
        shingled = dd.with_shingles(
            ensure_parallelism(corpus), 3, "text"
        ).select("doc_id", "shingles")
        sigs = dd.minhash_signatures(shingled, 64, "shingles", "doc_id")
        n_cand = dd.lsh_candidate_pairs(sigs, 16, "doc_id").count()

        t0 = time.time()
        n_pairs = dd.minhash_near_dups(corpus).count()
        dt = time.time() - t0
        points.append(
            {
                "n_docs": n_docs,
                "candidates": n_cand,
                "candidates_per_doc": round(n_cand / n_docs, 3),
                "verified_pairs": n_pairs,
                "pairs_per_doc": round(n_pairs / n_docs, 4),
                "sec": round(dt, 2),
                "us_per_doc": round(dt / n_docs * 1e6, 1),
            }
        )
        print(points[-1], flush=True)

    # Skewed-cell semantic-dedup probe: force EVERYTHING into one k-means
    # cell (n_clusters=1 — the degenerate case the max_cell_size cap
    # exists for) and grow the corpus. Capped pair cost is
    # |cell|·max_cell_size, so candidate pairs per vector and µs/vector
    # must stay ~flat; uncapped they would grow linearly with the cell.
    sem_points = []
    for mult in SCALES:
        n_vecs = 2_000 * mult
        vecs = spark.range(n_vecs).selectExpr(
            "id AS vec_id",
            "array(CAST(id % 13 + 1 AS DOUBLE), CAST(id % 11 AS DOUBLE),"
            " CAST(id % 7 AS DOUBLE), 1.0D) AS embedding",
        )
        t0 = time.time()
        n_pruned = (
            dd.semantic_dedup(
                vecs, threshold=0.999999, n_clusters=1, n_iters=1,
                max_cell_size=500,
            )
            .filter("NOT is_kept")
            .count()
        )
        dt = time.time() - t0
        sem_points.append(
            {
                "n_vecs": n_vecs,
                "pruned": n_pruned,
                "max_pairs_per_vec": 500,
                "sec": round(dt, 2),
                "us_per_vec": round(dt / n_vecs * 1e6, 1),
            }
        )
        print(sem_points[-1], flush=True)

    with open(out_path, "w") as f:
        json.dump(
            {
                "base_docs": BASE,
                "points": points,
                "semantic_skewed_cell": {
                    "design": "all vectors forced into ONE cell; "
                              "max_cell_size=500 sub-splits it",
                    "points": sem_points,
                },
            },
            f,
            indent=1,
        )
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
