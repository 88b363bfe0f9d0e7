"""Plan-shape regression tests (SURVEY.md §4): pin the physical facts that
make queries scale — pushdown, pruning, broadcast, shuffle counts, and the
boundary between JVM and sanctioned-Python execution. A value-correct result
off a degraded plan fails here first."""

import pytest

from big_data_analysis_for_stock_market_data_spark import queries as Q
from big_data_analysis_for_stock_market_data_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return Q.queries()[name](spark, SF)


def test_q1_filter_pushed_and_pruned(spark):
    df = q(spark, "q1_pricing_summary")
    pushed = " ".join(P.pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    (schema,) = P.read_schemas(df)
    # 16-col lineitem pruned to exactly the 7 referenced columns
    assert len(schema) == 7
    assert "l_comment" not in schema


def test_dim_joins_broadcast(spark):
    for name in ("j1_segment_rollup", "q5_nation_revenue", "q3_top_unshipped"):
        df = q(spark, name)
        assert P.has_broadcast_hash_join(df), name
        assert not P.has_sort_merge_join(df), name  # no fact-side shuffle join


def test_q5_all_scans_pruned(spark):
    # star join over 5 tables: every scan reads only the referenced columns
    for schema in P.read_schemas(q(spark, "q5_nation_revenue")):
        assert len(schema) <= 3


def test_projection_pipelines_shuffle_free(spark):
    for name in ("f_scalar_arithmetic", "text_quality_stats", "mm_payload_meta"):
        df = q(spark, name)
        assert P.count_shuffles(df) == 0, name


def test_topk_no_global_sort_shuffle(spark):
    # ORDER BY + LIMIT compiles to TakeOrderedAndProject: per-partition
    # top-k, k-row driver merge, zero Exchange nodes
    df = q(spark, "o1_topk_orders")
    assert P.count_shuffles(df) == 0
    assert "TakeOrderedAndProject" in P.explain_str(df, "simple")


def test_flagship_single_shuffle(spark):
    # both windows (user_id) and (user_id, date_only) reuse ONE exchange:
    # hash(user_id) already clusters the finer key (Q4 fusion payoff)
    df = q(spark, "flagship_label_daily")
    assert P.count_shuffles(df) == 1


def test_core_relational_paths_jvm_only(spark):
    for name in (
        "q1_pricing_summary", "j1_segment_rollup", "flagship_label_daily",
        "text_quality_stats", "text_langid", "dedup_exact_keep_first",
        "simsearch_cosine_scores", "ind_sma_bollinger",
    ):
        assert P.python_stages(q(spark, name)) == [], name


def test_recursive_indicators_use_sanctioned_crossing(spark):
    # exactly one Arrow-vectorized crossing; never row-at-a-time Python
    df = q(spark, "ind_recursive_family")
    stages = P.python_stages(df)
    assert stages == ["FlatMapGroupsInPandas"]
    assert P.count_shuffles(df) == 1  # one shuffle on the partition key


def test_asof_join_single_shuffle(spark):
    # union + repartition(user_id) + last(ignorenulls): no range explosion,
    # one exchange total
    df = q(spark, "asof_join_events")
    assert P.count_shuffles(df) == 1


def test_codegen_fuses_scalar_pipeline(spark):
    # whole-stage codegen must cover the scan->project pipeline
    assert len(P.codegen_ids(q(spark, "f_scalar_arithmetic"))) >= 1


@pytest.mark.parametrize("name", ["a2_sorted_avg", "j1_segment_rollup"])
def test_aggregates_bounded_shuffles(spark, name):
    # partial->final hash agg + output sort: at most 2 exchanges, and the
    # shuffled rows are group-level, not row-level
    assert P.count_shuffles(q(spark, name)) <= 2


def test_ensure_parallelism_never_converts_to_rdd(spark, monkeypatch):
    # partition estimation must stay driver-side metadata: df.rdd triggers
    # a full plan->RDD translation per call (VERDICT r2 item 4)
    from pyspark.sql import DataFrame

    from big_data_analysis_for_stock_market_data_spark.operators import ensure_parallelism

    def _boom(self):
        raise AssertionError("ensure_parallelism converted the plan to an RDD")

    monkeypatch.setattr(DataFrame, "rdd", property(_boom))

    scan = spark.read.parquet(f"{SF}/documents.parquet")
    widened = ensure_parallelism(scan)
    # sf0.001 documents is a single small file -> round-robin repartition
    assert "RoundRobinPartitioning" in P.explain_str(widened, "simple")

    # in-memory frame (no input files): trust upstream parallelism, no-op
    local = spark.range(100).toDF("n")
    assert ensure_parallelism(local) is local

    # enough files/splits already: no repartition inserted
    wide = ensure_parallelism(scan, min_partitions=1)
    assert "RoundRobinPartitioning" not in P.explain_str(wide, "simple")


def test_tpch_wide_joins_broadcast_dims(spark):
    # q7/q8/q9: every dim side is broadcast; the only shuffle-heavy join
    # is lineitem-orders
    for name in ("q7_nation_volume", "q8_market_share", "q9_product_profit"):
        df = q(spark, name)
        assert P.has_broadcast_hash_join(df), name


def test_q11_scalar_threshold_broadcast(spark):
    # the global mean-revenue cut joins as a broadcast of ONE row, not a
    # shuffled scalar
    df = q(spark, "q11_important_parts")
    assert P.has_broadcast_hash_join(df) or "BroadcastNestedLoopJoin" in P.explain_str(
        df, "simple"
    )


def test_q13_preaggregates_before_outer_join(spark):
    # orders collapse to one row per customer BEFORE the left join: the
    # join input is group-level, so HashAggregate must appear below the
    # join in the plan, and the whole query needs at most 3 exchanges
    df = q(spark, "q13_order_distribution")
    assert P.count_shuffles(df) <= 3


def test_q16_blacklist_is_broadcast_anti_join(spark):
    plan = P.explain_str(q(spark, "q16_supplier_part_count"), "simple")
    assert "LeftAnti" in plan and "Broadcast" in plan


@pytest.mark.parametrize("name", ["a8_summary_describe", "a9_corr_pairs"])
def test_single_pass_stats_one_scan_one_exchange(spark, name):
    # one pruned scan, partial->final aggregate, single 1-row exchange —
    # a union-of-selects formulation would re-scan per output row group
    df = q(spark, name)
    assert P.count_shuffles(df) <= 1
    schemas = P.read_schemas(df)
    assert len(schemas) == 1  # exactly one parquet scan
    assert set(schemas[0]) <= {"l_quantity", "l_extendedprice", "l_discount"}


def test_sampling_adds_no_shuffle(spark):
    # hash sampling is projection + filter on the scan: zero exchanges
    assert P.count_shuffles(q(spark, "samp_stratified_docs")) == 0


def test_topk_per_group_single_shuffle(spark):
    # rank-per-group: one hash exchange on the group key
    assert P.count_shuffles(q(spark, "samp_topk_quality")) <= 1


def test_simhash_banded_join_not_cartesian(spark):
    # candidates come from the (chunk_id, chunk_val) equi-join — a
    # cartesian/broadcast-nested-loop product would be the scale bug
    s = P.explain_str(q(spark, "dedup_simhash_near"))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_stock_feature_frame_shuffle_budget(spark):
    # The full FE pipeline earns exactly 4 exchanges (fixture prefix sum,
    # daily/label windows, bucketed closed-form pass, recursive per-key
    # pass); a regression that re-shuffles the wide enriched frame shows
    # up here before it shows up in BENCH
    from big_data_analysis_for_stock_market_data_spark import stock

    bars = stock.make_stock_fixture(spark, n_rows=4_000, n_symbols=2)
    full = stock.feature_frame(bars)
    assert P.count_shuffles(full) <= 4


def test_chunking_is_shuffle_free_flatmap(spark):
    # chunking must stay a generate-over-scan: no exchange, no Python node
    df = q(spark, "text_chunk_overlap")
    assert P.count_shuffles(df) == 0
    s = P.explain_str(df)
    assert not any(n in s for n in P.PYTHON_NODES)


def test_pack_sequences_single_shard_shuffle(spark):
    # packing shuffles once, keyed on the shard column — never a global sort
    df = q(spark, "text_pack_sequences")
    assert P.count_shuffles(df) == 1
    assert "rangepartitioning" not in P.explain_str(df).lower()


def test_merge_latest_partial_aggregates_before_exchange(spark):
    # SCD-1 merge: the map side must reduce to one candidate per
    # (partition, key) BEFORE the shuffle (partial_max_by), one exchange
    df = q(spark, "merge_latest_events")
    assert P.count_shuffles(df) == 1
    assert "partial_max_by" in P.explain_str(df)


def test_curate_gate_one_scan_one_shuffle(spark):
    # all quality signals come out of one scan; only the fingerprint-keyed
    # dedup window shuffles
    df = q(spark, "text_curate_gate")
    assert P.count_shuffles(df) == 1
    schemas = P.read_schemas(df)
    assert len(schemas) == 1


def test_cci_single_window_shuffle(spark):
    # nested-SMA mean deviation stays one window: one exchange, no Python
    df = q(spark, "ind_cci20")
    assert P.count_shuffles(df) == 1
    s = P.explain_str(df)
    assert not any(n in s for n in P.PYTHON_NODES)


def test_closed_form_indicator_surface_shuffles(spark):
    # fixture prefix-sum + one symbol-keyed window layer; the whole
    # 11-column indicator surface must not re-shuffle per indicator
    df = q(spark, "stock_closed_form_indicators")
    assert P.count_shuffles(df) <= 3


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """DPP: joining a partition-columned fact against a FILTERED dim must
    inject a runtime pruning subquery into the fact scan — at 100 TB this
    is the difference between scanning 3 partitions and scanning 3000.
    Catalyst only plans DPP when the fact side is partitioned storage, so
    the test materializes one."""
    import pyspark.sql.functions as F

    fact_dir = str(tmp_path / "fact")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    li.write.mode("overwrite").partitionBy("l_suppkey").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        spark.read.parquet(f"{SF}/supplier.parquet")
        .filter(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey"), F.col("s_name"))
    )
    joined = fact.join(
        dim, fact["l_suppkey"] == dim["s_suppkey"]
    ).groupBy("s_name").agg(F.sum("l_quantity").alias("qty"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_jl_projection_is_pure_map(spark):
    # ml_random_projection: per-row expressions only — zero shuffles,
    # the plan that stays linear at any corpus size
    df = q(spark, "ml_random_projection")
    # the final orderBy adds a range exchange; everything upstream of it
    # must be shuffle-free, so total shuffles == 1 (the presentation sort)
    assert P.count_shuffles(df) <= 1


def test_cusum_and_rolling_ols_single_user_shuffle(spark):
    # both windows + the aggregate reuse ONE hash partitioning on the key
    for name in ("a33_cusum_alarm", "w_rolling_ols_slope",
                 "ind_wma_closed_form"):
        df = q(spark, name)
        # one key shuffle + one presentation sort
        assert P.count_shuffles(df) <= 2, name


def test_rule_audit_single_scan(spark):
    # dq_rule_violations: six rules, ONE file scan, no shuffle beyond
    # the 1-row aggregate
    df = q(spark, "dq_rule_violations")
    assert len(P.read_schemas(df)) == 1
    assert P.count_shuffles(df) <= 1


def test_point_in_polygon_broadcasts_edges(spark):
    # the 21-row polygon edge table must broadcast; the big point side
    # never shuffles before the per-point aggregate
    df = q(spark, "j10_point_in_polygon")
    assert not P.has_sort_merge_join(df)


def test_exact_median_narrowing_residue_bounded(spark):
    """VERDICT r06 task 2: the exact-median entry must never sort/rank
    more than the doubly-narrowed residue. Pin it empirically: after
    the operator's two 1024-bucket rounds the survivor set entering the
    final unpartitioned rank window is <= max(16, n/1024**2) rows, and
    the picked order statistic equals the full-sort median."""
    from pyspark.sql import functions as F

    from big_data_analysis_for_stock_market_data_spark.operators import (
        aggregates as agg_ops,
    )
    from big_data_analysis_for_stock_market_data_spark.sources.io import (
        read_parquet,
    )

    v = read_parquet(spark, f"{SF}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("cents")
    )
    n = v.count()
    survivors, kdf = agg_ops.exact_rank_narrow(v, "cents", rounds=2)
    residue = survivors.count()
    assert residue <= max(16, n // (1024 * 1024))
    k = kdf.collect()[0]["k"]
    got = (
        survivors.orderBy("cents").collect()[k - 1]["cents"]
    )
    want = sorted(r["cents"] for r in v.collect())[(n + 1) // 2 - 1]
    assert got == want
    # the registered entry agrees end-to-end
    row = q(spark, "agg_exact_median_scalable").collect()[0]
    assert row["n_rows"] == n and row["median_cents"] == want


def test_container_synthesis_never_shuffles_payload(spark):
    # r11: the width for both Python passes is established on the NARROW
    # (id, text) input; the synthesized binary payload must not appear in
    # any exchange (the pre-r11 plan round-robin-shuffled it between the
    # synthesize and parse passes). r12 (ADVICE r11): the simple-mode
    # Exchange line only prints partitioning expressions, so the original
    # payload-grep was vacuous — assert STRUCTURE instead: the two
    # MapInPandas nodes must be adjacent plan lines (synthesize feeding
    # parse in one stage), which is false exactly when an exchange (or
    # any other operator) separates them.
    df = q(spark, "mm_container_headers")
    plan = P.explain_str(df, "simple")
    lines = plan.splitlines()
    idx = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
    assert len(idx) == 2, plan
    assert idx[1] == idx[0] + 1, "\n".join(lines[idx[0]:idx[1] + 1])
    # and the formatted plan must show no Exchange consuming the payload
    fmt = P.explain_str(df, "formatted")
    blocks = fmt.split("\n\n")
    for blk in blocks:
        if blk.startswith("(") and "Exchange" in blk.splitlines()[0]:
            assert "payload" not in blk, blk


def test_mm_python_fanout_is_size_aware(spark):
    # r12 (guide §2.5-2.6 / VERDICT r11 items 2+4): the Python fan-out
    # width is derived from the input's scan bytes, not pinned to the
    # session target — a KB-scale corpus must NOT spin a full complement
    # of Python workers (measured 2-7x slower at width 32 than width 1
    # for the light parsers at sf0.1). At the unit-test corpus size the
    # light paths stay at scan width: no RoundRobinPartitioning exchange
    # in the wav/png plans at all.
    for name in ("mm_wav_native_decode", "mm_png_native_decode",
                 "mm_container_headers"):
        plan = P.explain_str(q(spark, name), "simple")
        assert "RoundRobinPartitioning" not in plan, (name, plan)


def test_ann_candidate_dedup_hash_aggregates(spark):
    # r11: candidate-pair dedup is distinct(), which hash-aggregates;
    # dropDuplicates(ids) compiled to first(array<float>) whose
    # variable-width buffer forced SortAggregate (two extra sorts of the
    # widest intermediate). r12: the distinct now runs over
    # (ids, cos_sim) — all fixed-width — so additionally no exchange
    # after the bucket join may carry a vector column: the vectors must
    # not outlive the join stage.
    import re

    vec_cols = re.compile(r"__lvec|__rvec|__qvec|__va|__vb|embedding")
    for name in ("simsearch_ann_join", "simsearch_lsh_topk",
                 "dedup_cosine_near"):
        df = q(spark, name)
        plan = P.explain_str(df, "simple")
        assert "SortAggregate" not in plan, name
        fmt = P.explain_str(df, "formatted")
        for blk in fmt.split("\n\n"):
            lines = blk.splitlines()
            if not (lines and blk.startswith("(")):
                continue
            # keyed (hash/range) exchanges are the post-join ones — the
            # dedup, window and orderBy shuffles; the pre-join scan
            # widening is RoundRobin and the broadcast side legitimately
            # carries the bucketed vectors INTO the join
            if ("Exchange" in lines[0]
                    and "BroadcastExchange" not in lines[0]
                    and ("hashpartitioning" in blk
                         or "rangepartitioning" in blk)):
                assert not vec_cols.search(blk), (name, blk)
