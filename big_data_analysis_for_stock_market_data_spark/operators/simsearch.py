"""Similarity search over embedding columns (north-star surface).

Two paths, mirroring what a 100 TB pipeline needs:

- **Brute-force cosine top-k** (the exactness baseline): broadcast the query
  set, compute cosine as JVM higher-order functions (``zip_with`` +
  ``aggregate`` in double), rank per query. Cost |corpus|·|queries| — right
  whenever the query set is small enough to broadcast, which is the common
  "find neighbors for these N items" shape.

- **LSH-bucketed ANN** (random hyperplane / signed random projection): a
  deterministic pseudo-random hyperplane family (seeded xxhash64 → ±1
  components) maps each vector to a sign-bit bucket key; candidates join
  within buckets only, then exact cosine re-ranks. Sub-linear candidate
  generation; recall tuned by (n_planes, n_tables).

Everything is expression-level (no UDF): the dot product runs inside
whole-stage codegen. A Pandas-UDF variant is deliberately absent — at dim
≤ a few thousand, ``aggregate(zip_with(...))`` beats the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (inputs cast element-wise so float arrays don't
    accumulate in float32)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def with_normalized(df: DataFrame, col: str = "embedding",
                    out: str = "embedding_norm") -> DataFrame:
    """Pre-normalize once so downstream cosine = plain dot product — at
    scale, normalization is a write-once column, not a per-query cost."""
    n = l2_norm(F.col(col))
    return df.withColumn(
        out, F.transform(F.col(col), lambda x: F.try_divide(x.cast("double"), n))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector. ``queries`` must
    be broadcastable (the deliberate contract of the exact path). Ties break
    on neighbor id for determinism. Excludes self-matches when ids collide.

    ``round_to``: rank on (and emit) the cosine rounded to this many
    decimals. Sub-ulp summation noise can otherwise flip the order of two
    near-tied neighbors between runs/engines; rounding makes the ranking —
    and therefore the whole result — reproducible and oracle-comparable."""
    corpus = ensure_parallelism(corpus)
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("__qid")
    )
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = scored.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        sim.alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


#: resolve_n_planes defaults: 8 planes saturate recall up to ~2000 corpus
#: rows (ANN_SCALE_PROBE.json); each corpus-size doubling past that adds
#: one plane, holding expected bucket occupancy — and therefore candidate
#: pairs per row — roughly constant instead of linear in corpus size.
AUTO_PLANES_BASE = 8
AUTO_PLANES_BASE_ROWS = 2000


def resolve_n_planes(
    n_planes: int | str,
    corpus: DataFrame | None = None,
    corpus_rows: int | None = None,
) -> int:
    """Bucket-width sizing for the sign-LSH family. ``n_planes='auto'``
    returns ``AUTO_PLANES_BASE + k`` where k is the smallest integer with
    ``AUTO_PLANES_BASE_ROWS * 2**k >= corpus_rows`` — the integer-exact
    form of ``8 + ceil(log2(corpus_rows / 2000))``, floored at 8 for small
    corpora.

    Why this exists: ANN_SCALE_PROBE.json measured that a FIXED plane
    count turns bucket-join cost quadratic in corpus size (candidates per
    left row grew 9.6x when the corpus grew 10x; the join 50x), while
    adding ceil(log2(scale)) planes held candidate growth to 2.7x at
    99.8% matched-row coverage. At 100 TB a caller taking the default
    must get the sized family, not the cliff.

    ``corpus_rows`` is an optional hint that avoids the one bounded
    driver action (a ``count()``) auto mode otherwise fires; an int
    ``n_planes`` passes through untouched (explicit override)."""
    if n_planes == "auto":
        rows = corpus_rows
        if rows is None:
            if corpus is None:
                raise ValueError(
                    "n_planes='auto' requires corpus or corpus_rows"
                )
            rows = corpus.count()
        k = 0
        while AUTO_PLANES_BASE_ROWS << k < rows:
            k += 1
        return AUTO_PLANES_BASE + k
    if isinstance(n_planes, bool) or not isinstance(n_planes, int):
        raise ValueError(f"n_planes must be an int or 'auto', got {n_planes!r}")
    return n_planes


def _hyperplane_dot(vec: Column, table: int, plane: int, dim: int) -> Column:
    """Σ_j vec[j] · s(table, plane, j) with ±1 components derived from
    seeded xxhash64 INSIDE the expression — no dim-sized literal arrays.
    (The literal-array form made the 32-plane plan tree so large that
    analysis+codegen dominated runtime: 7s for 500 vectors.)"""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    signed = F.zip_with(
        vec, idx,
        lambda x, j: x.cast("double")
        * (F.xxhash64(j, F.lit(table), F.lit(plane)) % 2 * 2 - 1).cast("double"),
    )
    return F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)


def _bucket_expr(
    vec: Column, table: int, n_planes: int, dim: int,
    plane_mode: str = "hash",
) -> Column:
    """Sign-random-projection bucket id for one hash table (bits packed
    into an int, offset by the table id so tables never collide).

    ``plane_mode='hash'``: ±1 hyperplane components derived from seeded
    xxhash64 (the production family). ``plane_mode='axis'``: plane p of
    table t is the coordinate axis ``(t·n_planes + p) mod dim`` — the bit
    is simply ``vec[axis] >= 0``. A legitimate sign-LSH family when
    components are near-iid (true of normalized embeddings), and — unlike
    the seeded-hash family — expressible verbatim in external SQL, which
    is what lets a DuckDB oracle replay candidates+verify exactly."""
    expr: Column = F.lit(table * (2 ** n_planes))
    for p in range(n_planes):
        if plane_mode == "hash":
            bit = _hyperplane_dot(vec, table, p, dim) >= 0
        elif plane_mode == "axis":
            axis = (table * n_planes + p) % dim
            bit = F.element_at(vec, axis + 1) >= 0
        else:
            raise ValueError(f"unknown plane_mode {plane_mode!r}")
        expr = expr + F.when(bit, 1).otherwise(0) * (2 ** p)
    return expr


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int | str = "auto",
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    plane_mode: str = "hash",
    round_to: int | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets over ``n_tables``
    independent tables (union of candidates → recall boost), exact cosine
    re-rank inside the candidate set. The corpus is hashed once per table;
    at scale the bucketed corpus would be written out and reused across
    query batches (the IVF-file pattern). ``round_to`` rounds the cosine
    BEFORE ranking so near-ties order identically across engines;
    ``plane_mode='axis'`` makes the bucket family SQL-replayable (see
    ``_bucket_expr``). ``n_planes`` defaults to ``'auto'``, sizing the
    bucket width from the corpus cardinality (``resolve_n_planes``) so the
    candidate volume stays flat as the corpus grows; an int overrides;
    ``corpus_rows`` skips the sizing count.

    Precondition (shared with ``ann_join``/``cosine_near_dup_pairs``):
    ids uniquely determine their vectors — true of any sane embedding
    table. Candidate dedup relies on it (duplicate ids with DIFFERENT
    vectors would emit one row per distinct score instead of one per id
    pair)."""
    n_planes = resolve_n_planes(n_planes, corpus, corpus_rows)
    corpus = ensure_parallelism(corpus)
    c_buckets = corpus.select(
        id_col, vec_col,
        F.explode(
            F.array(*[_bucket_expr(F.col(vec_col), t, n_planes, dim,
                                   plane_mode=plane_mode)
                      for t in range(n_tables)])
        ).alias("__bucket"),
    )
    q_buckets = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.explode(
            F.array(*[_bucket_expr(F.col(vec_col), t, n_planes, dim,
                                   plane_mode=plane_mode)
                      for t in range(n_tables)])
        ).alias("__bucket"),
    )
    # Candidate dedup is distinct() over (ids + cos_sim), with the cosine
    # computed BEFORE the dedup: the vectors are functionally determined
    # by their ids (same exploded source row), so the score is too, and
    # the deduped row set is identical to deduping on (ids + vecs) — but
    # the aggregation keys are now all FIXED-WIDTH (two ids + one
    # double), so the hash map stays compact, the dedup exchange carries
    # ~24 bytes/row instead of two 64-float vectors (~20x), and the
    # per-candidate NaN/-0.0 array normalization Spark inserts for
    # array-typed grouping keys disappears. (dropDuplicates(ids) is still
    # avoided: first(array<float>) buffers force SortAggregate — r11,
    # guide §3/§7.2; this keeps HashAggregate AND drops the vectors from
    # the aggregation entirely — r12, guide §2.3 shuffle-fewer-bytes.)
    # Multi-bucket duplicates score identically (pure function of the
    # vecs), so distinct() collapses them exactly as before.
    cos = cosine(F.col(vec_col), F.col("__qvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        c_buckets.join(F.broadcast(q_buckets), "__bucket")
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def ann_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 1,
    dim: int = 64,
    n_planes: int | str = "auto",
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_mode: str = "hash",
    round_to: int | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Corpus-to-corpus approximate nearest-neighbor JOIN: for every left
    vector, its top-k approximate neighbors among the right vectors —
    retrieval-style linking (eval→train near-dup attribution, cross-corpus
    retrieval augmentation) where BOTH sides are large.

    Unlike ``lsh_bucket_topk`` (which broadcasts a bounded query batch),
    both sides here bucket by sign-LSH and meet in a bucket-keyed SHUFFLE
    equi join — each side scans once, candidates are bounded by bucket
    co-occupancy, and nothing is broadcast, so the operator survives two
    100 TB corpora. Exact cosine re-ranks candidates; ``round_to`` rounds
    before ranking for cross-engine tie stability; ``plane_mode='axis'``
    makes the family SQL-replayable. A left vector with no shared bucket
    yields no row (ANN contract: recall is tunable via tables/planes).
    ``n_planes`` defaults to ``'auto'``, sizing the bucket width from the
    RIGHT (retrieved) corpus cardinality via ``resolve_n_planes`` — the
    measured fix for the fixed-plane quadratic-candidates cliff; an int
    overrides; ``corpus_rows`` skips the sizing count. Unique-id
    precondition as in ``lsh_bucket_topk``."""
    n_planes = resolve_n_planes(n_planes, right, corpus_rows)
    l_b = ensure_parallelism(left).select(
        F.col(id_col).alias("__lid"),
        F.col(vec_col).alias("__lvec"),
        F.explode(
            F.array(*[_bucket_expr(F.col(vec_col), t, n_planes, dim,
                                   plane_mode=plane_mode)
                      for t in range(n_tables)])
        ).alias("__bucket"),
    )
    r_b = ensure_parallelism(right).select(
        F.col(id_col).alias("__rid"),
        F.col(vec_col).alias("__rvec"),
        F.explode(
            F.array(*[_bucket_expr(F.col(vec_col), t, n_planes, dim,
                                   plane_mode=plane_mode)
                      for t in range(n_tables)])
        ).alias("__bucket"),
    )
    # Score BEFORE the candidate dedup, then distinct() over (ids +
    # cos_sim): the vectors are functionally determined by the ids, so
    # the cosine is too and the deduped row set is identical — but the
    # aggregation keys are fixed-width (no array normalization per row),
    # the dedup exchange carries ~24 bytes/row instead of two 64-float
    # vectors, and the vectors never outlive the bucket-join stage (r12,
    # guide §2.3; see lsh_bucket_topk for the full rationale and why
    # dropDuplicates(ids) stays banned). __bucket is dropped by the
    # select, so multi-bucket pairs still collapse to one row — they
    # score identically by construction.
    cos = cosine(F.col("__lvec"), F.col("__rvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
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
        .filter(F.col("rank") <= k)
        .orderBy("left_id", "rank")
    )


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: seeded k-means over the corpus; every vector is
    assigned to its nearest centroid. Returns (assigned corpus with a
    ``__cluster`` column, centroids DataFrame (__cluster, __center)).

    At scale this is the write-once index step: the assigned corpus is
    persisted clustered/partitioned by ``__cluster``, so probing reads only
    n_probe/n_clusters of the data (partition pruning does the skipping)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corpus = ensure_parallelism(corpus)
    with_vec = corpus.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__features",
                predictionCol="__cluster")
    from big_data_analysis_for_stock_market_data_spark.ml.pipeline import (
        strip_training_summaries,
    )

    # shed the KMeans training summary before transform: it pins the
    # SparkSession in the closure, which is non-serializable once any
    # Observation has run (see ml/pipeline.strip_training_summaries)
    model = strip_training_summaries(km.fit(with_vec))
    assigned = model.transform(with_vec).drop("__features")
    centroids = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cluster int, __center array<double>",
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    round_to: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, each query probes
    its ``n_probe`` nearest centroids, exact cosine re-ranks within the
    probed cells. ``n_probe == n_clusters`` degrades gracefully to exact
    brute force (asserted in tests). Candidate cost ≈ |corpus|·n_probe/
    n_clusters per query versus |corpus| for brute force. ``round_to``
    rounds the cosine before ranking (same cross-engine tie-stability
    knob as ``brute_force_topk``)."""
    assigned, centroids = ivf_index(corpus, n_clusters, id_col, vec_col, seed)

    # squared L2 to each centroid; top n_probe cells per query
    d2 = F.aggregate(
        F.zip_with(
            F.col("__qvec"), F.col("__center"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    q_cells = (
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("__d2", d2)
    )
    pw = Window.partitionBy("__qid").orderBy(F.col("__d2").asc(), F.col("__cluster"))
    probes = (
        q_cells.withColumn("__pr", F.row_number().over(pw))
        .filter(F.col("__pr") <= n_probe)
        .select("__qid", "__qvec", "__cluster")
    )

    cand = (
        assigned.join(F.broadcast(probes), "__cluster")
        .filter(F.col(id_col) != F.col("__qid"))
    )
    score = cosine(F.col(vec_col), F.col("__qvec"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = cand.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        score.alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | str = "auto",
    n_tables: int = 4,
    dim: int = 64,
    plane_mode: str = "hash",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup's semantic variant):
    LSH-bucket the corpus against itself, exact-cosine verify, keep pairs
    ≥ threshold. Returns (id_a, id_b, cos_sim), id_a < id_b.
    ``n_planes`` defaults to ``'auto'``, sizing buckets from the corpus
    cardinality (``resolve_n_planes``); an int overrides; ``corpus_rows``
    skips the sizing count. Unique-id precondition as in
    ``lsh_bucket_topk``."""
    n_planes = resolve_n_planes(n_planes, df, corpus_rows)
    df = ensure_parallelism(df)
    bucketed = df.select(
        id_col, vec_col,
        F.explode(
            F.array(*[_bucket_expr(F.col(vec_col), t, n_planes, dim,
                                   plane_mode=plane_mode)
                      for t in range(n_tables)])
        ).alias("__bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__bucket"
    )
    # Score before the dedup, filter on the threshold, THEN distinct()
    # over (ids + cos_sim) — same fixed-width-keys rationale as
    # lsh_bucket_topk/ann_join (the cosine is functionally determined by
    # the id pair, so the deduped set is identical), plus the threshold
    # filter now runs BEFORE the aggregation, so only near-duplicate
    # pairs enter the dedup exchange at all (r12, guide §2.3).
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine(F.col("__va"), F.col("__vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
        .orderBy("id_a", "id_b")
    )


def _sq_dist(vec: Column, cent: Column) -> Column:
    """Σ_j (vec[j] - cent[j])² in double — a sequential fold, matching what
    an order-preserving SQL list_sum computes (same precedent as cosine)."""
    diffs = F.zip_with(
        vec, cent,
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def deterministic_kmeans(
    corpus: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Lloyd iterations made engine-deterministic — the oracle-checkable
    coarse quantizer behind the IVF scale path (``ivf_index`` keeps Spark
    ML's KMeans for production; THIS variant exists so the full iterative
    algorithm can be certified against an external SQL replay):

    - init: the ``n_clusters`` vectors with the smallest md5 bucket of
      their id (``ml.split_bucket``'s trick — a pure data function, not a
      partition-seeded sample); cluster ids 0..n-1 in (bucket, id) order;
    - assign: argmin squared distance, ties to the lowest cluster id;
    - update: per-dimension mean with DECIMAL(18,9)-exact sums (addition
      order cannot perturb the centroid), divided in double; empty
      clusters keep their previous centroid;
    - a FIXED ``n_iters`` (no convergence test): iteration count is part
      of the spec, so any engine replays the identical computation.

    Scale: assignment is a broadcast of n_clusters×dim doubles against the
    corpus (narrow, one pass); the update is one groupBy on (cluster, dim)
    — rows = |corpus|·dim, the same shuffle volume any distributed k-means
    pays. Returns (cluster int, centroid array<double>).
    """
    from big_data_analysis_for_stock_market_data_spark.ml.pipeline import split_bucket

    b = split_bucket(F.col(id_col), seed)
    w_init = Window.orderBy(b.asc(), F.col(id_col).asc())
    cents = (
        corpus.select(id_col, vec_col)
        .withColumn("__rn", F.row_number().over(w_init))
        .filter(F.col("__rn") <= n_clusters)
        .select(
            (F.col("__rn") - 1).alias("cluster"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )
    for _ in range(n_iters):
        joined = corpus.select(id_col, vec_col).crossJoin(F.broadcast(cents))
        w_arg = Window.partitionBy(id_col).orderBy(
            _sq_dist(F.col(vec_col), F.col("centroid")).asc(),
            F.col("cluster").asc(),
        )
        assigned = (
            joined.withColumn("__rn", F.row_number().over(w_arg))
            .filter(F.col("__rn") == 1)
            .select(id_col, vec_col, "cluster")
        )
        dims = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count("val")
                ).alias("mean")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "mean"))
                    ),
                    lambda s: s.getField("mean"),
                ).alias("new_centroid")
            )
        )
        cents = (
            cents.join(means, "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("new_centroid"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            # Truncate lineage each round (the exact_rank_narrow /
            # connected-components precedent): without this the
            # centroid plan nests the full corpus once per iteration,
            # and every downstream reference (corpus assign, query
            # probe, PQ encode) re-executes the WHOLE training lineage
            # — measured 16 parquet scans / 37 exchanges for
            # ivf_det_topk at 2 iterations. The checkpointed frame is
            # n_clusters rows; values are unchanged.
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_det_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 3,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN top-k over the deterministic quantizer: assign the corpus to
    final centroids, probe each query's ``n_probe`` nearest cells, exact
    cosine re-rank (rounded before ranking for cross-engine tie order).
    Same probe-prunes-the-scan shape as ``ivf_topk``; every step replayable
    in SQL."""
    cents = deterministic_kmeans(
        corpus, n_clusters, n_iters, id_col, vec_col, seed
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        _sq_dist(F.col(vec_col), F.col("centroid")).asc(),
        F.col("cluster").asc(),
    )
    assigned = (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cluster")
    )
    w_probe = Window.partitionBy("__qid").orderBy(
        _sq_dist(F.col("__qvec"), F.col("centroid")).asc(),
        F.col("cluster").asc(),
    )
    probes = (
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("__qid", "__qvec", "cluster")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("__qid"))
        .dropDuplicates([id_col, "__qid"])
    )
    scored = cand.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), round_to).alias(
            "cos_sim"
        ),
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression half of IVF-PQ, the
# canonical web-scale ANN layout. A d-dim vector becomes m sub-codes (one
# per d/m-dim subspace); approximate distances come from per-subspace
# lookup tables (ADC), so the corpus is scanned as m bytes/vector instead
# of d floats — at 100 TB that is the difference between RAM-resident and
# not. Codebook families mirror the LSH/IVF precedent: 'md5' derives
# centroid components from md5-60 uniforms INSIDE the expression (no
# dim-sized literals, externally replayable in any SQL engine — the oracle
# mode); a SparkML-KMeans-trained codebook would be the quality-tuned
# production variant (same encode/ADC machinery).
# ---------------------------------------------------------------------------

def _pq_centroid(sub: Column, cent: Column, j: Column) -> Column:
    """Deterministic codebook component in [-1, 1]: md5-60 uniform of
    (sub, cent, j) — identical hex, hence identical double, in every
    engine."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", sub, cent, j, F.lit("pq"))), 1, 15
        ),
        16, 10,
    ).cast("long")
    return (h % 1000000007) / 1000000007.0 * 2.0 - 1.0


def _pq_subdist(vec: Column, sub: Column, cent: Column, d_sub: int) -> Column:
    """Σ_j (vec[sub·d_sub + j] − centroid(sub, cent, j))² — left-to-right
    fold, matching an external list_reduce replay."""
    idx = F.sequence(F.lit(0), F.lit(d_sub - 1))
    return F.aggregate(
        idx, F.lit(0.0),
        lambda acc, j: acc + F.pow(
            F.element_at(vec, (sub * d_sub + j + 1).cast("int")).cast("double")
            - _pq_centroid(sub, cent, j),
            F.lit(2.0),
        ),
    )


def pq_encode(
    df: DataFrame,
    col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    out: str = "pq_code",
) -> DataFrame:
    """Encode each vector as m sub-codes: per subspace, the argmin-distance
    centroid (first index on exact ties). Pure expressions — the k×d_sub
    loop lives in runtime ``transform``/``aggregate``, not in the plan
    tree, so codegen stays small at any (m, k)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    vec = F.col(col)
    subs = F.sequence(F.lit(0), F.lit(m - 1))
    code = F.transform(
        subs,
        lambda s: (
            F.array_position(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda c: _pq_subdist(vec, s, c, d_sub),
                ),
                F.array_min(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(k - 1)),
                        lambda c: _pq_subdist(vec, s, c, d_sub),
                    )
                ),
            ) - 1
        ).cast("int"),
    )
    return df.withColumn(out, code)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_neighbors: int = 5,
    col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_col: str = "qvec",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> DataFrame:
    """ADC top-k: corpus vectors are scanned by their PQ codes only; the
    query side computes the m×k distance table and each candidate's
    approximate distance is Σ_s table[s][code_s] — m lookups per vector.
    Scores round to 6 dp before ranking (near-ties order identically
    across engines); ties break on neighbor id. The query set broadcasts
    (same contract as brute_force_topk)."""
    d_sub = dim // m
    encoded = pq_encode(corpus, col=col, m=m, k=k, dim=dim)
    joined = encoded.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    qvec = F.col(query_col)
    approx = F.aggregate(
        F.zip_with(
            F.col("pq_code"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: _pq_subdist(qvec, s, c.cast("bigint"), d_sub),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(approx, 6).alias("approx_sqdist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_sqdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_neighbors)
    )


def ivfpq_det_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 3,
    n_iters: int = 2,
    m: int = 8,
    pq_k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ, the canonical web-scale ANN layout, end-to-end
    deterministic: the IVF coarse quantizer (``deterministic_kmeans``)
    prunes the scan to ``n_probe`` cells per query, and within candidates
    the PQ codes score by ADC lookups instead of exact distance — at
    100 TB the probed cells are partition-pruned AND each candidate costs
    m code lookups, not dim float multiplies. Every stage (Lloyd
    iterations, cell assignment, codebook, encode, ADC) is replayable in
    external SQL, so the WHOLE composition is hash-verifiable."""
    d_sub = dim // m
    cents = deterministic_kmeans(
        corpus, n_clusters, n_iters, id_col, vec_col, seed
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        _sq_dist(F.col(vec_col), F.col("centroid")).asc(),
        F.col("cluster").asc(),
    )
    assigned = (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cluster")
    )
    encoded = pq_encode(assigned, col=vec_col, m=m, k=pq_k, dim=dim)
    w_probe = Window.partitionBy("__qid").orderBy(
        _sq_dist(F.col("__qvec"), F.col("centroid")).asc(),
        F.col("cluster").asc(),
    )
    probes = (
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("__qid", "__qvec", "cluster")
    )
    cand = (
        encoded.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("__qid"))
        .dropDuplicates([id_col, "__qid"])
    )
    qvec = F.col("__qvec")
    approx = F.aggregate(
        F.zip_with(
            F.col("pq_code"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: _pq_subdist(qvec, s, c.cast("bigint"), d_sub),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = cand.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(approx, round_to).alias("approx_sqdist"),
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_sqdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def int8_quantize(
    df: DataFrame,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard vector-store
    compression step (4x over float32; 8x over float64): q_i =
    round(127 * x_i / max|x|), scale carried per vector for
    dequantization. Pure JVM array expressions, engine-exact: the only
    arithmetic is IEEE multiply/divide on doubles derived from the same
    float32 payload plus a double->integer rounding (portable, unlike
    decimal-place rounding). Zero vectors quantize to zeros with scale 0.

    Returns (id, scale_abs, q8): ``scale_abs`` = max|x| (dequantize as
    q * scale_abs / 127), ``q8`` the int array in [-127, 127]."""
    x = F.transform(F.col(col), lambda v: v.cast("double"))
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    q = F.when(
        mx == 0.0, F.transform(x, lambda v: F.lit(0))
    ).otherwise(
        F.transform(
            x, lambda v: F.round(v / mx * 127.0, 0).cast("int")
        )
    )
    return df.select(
        F.col(id_col), mx.alias("scale_abs"), q.alias("q8")
    )
