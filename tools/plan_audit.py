"""Registry-wide physical-plan antipattern sweep.

Builds every ``queries()`` entry at a small SF and records, per entry:
exchange count, file-scan count, Python-executing nodes, and
cartesian/broadcast-nested-loop joins. Violations:

- ``BatchEvalPython`` anywhere (row-at-a-time Python — never sanctioned);
- ``CartesianProduct``/``BroadcastNestedLoopJoin`` outside the deliberate
  broadcast-query brute-force ANN family;
- more than MAX_EXCHANGES exchanges (a registry entry is one query shape,
  not a pipeline — double digits means an accidental reshuffle loop).

Entries whose *construction* executes work (streaming drains, ML training,
iterative algorithms, sink roundtrips) still run — this tool is slow
(~minutes) by design and is run per-round, not per-test.

Usage: python tools/plan_audit.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Deliberate exhaustive-scoring designs: a bounded broadcast query set
#: against every row IS the brute-force contract (and the LSH/IVF entries
#: probe with the same broadcast pattern).
NESTED_LOOP_OK = {
    "simsearch_bruteforce_topk",
    "simsearch_cosine_scores",
    "simsearch_lsh_topk",
    "simsearch_ivf_topk",
    "simsearch_ivf_det_topk",
    "simsearch_pq_topk",
    "simsearch_ivfpq_det_topk",
    "dedup_cosine_near",
    # scalar-subquery crosses: BroadcastNestedLoopJoin against a 1-row
    # aggregate is the correct global-threshold plan (TPC-H Q11/Q22 shape)
    "q11_important_parts",
    "q22_sales_opportunity",
    "g1_triangle_count",   # 1-row x 1-row scalar combine (count + edge count)
    "a18_chi2_independence",  # 1-row statistic x 1-row dof combine
}

MAX_EXCHANGES = 9

#: Multi-stage algorithms earn a larger, PINNED budget (adjudicated against
#: the r04 audit): regressions past the pin still flag.
EXCHANGE_BUDGET = {
    "dedup_ngram_jaccard": 16,     # shingle index -> pairs -> verify joins
    "text_contamination_check": 12,  # split -> train index -> cand -> verify
    "dedup_minhash_near": 12,      # signatures -> bands -> buckets -> verify
    "dedup_minhash_md5": 12,
    "simsearch_ivf_det_topk": 40,  # unrolled Lloyd iterations (deliberate)
    "simsearch_ivfpq_det_topk": 40,  # same Lloyd unroll + PQ encode
    "q21_sole_late_supplier": 12,  # 4-way join + semi + anti branches
    "a11_funnel_conversion": 13,   # per step: event shuffle + agg + join
    "w_rolling_active_users": 11,  # islands + deltas + 2-phase prefix sum
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"

    from big_data_analysis_for_stock_market_data_spark import queries as registry
    from big_data_analysis_for_stock_market_data_spark.plans import inspect as P
    from big_data_analysis_for_stock_market_data_spark.session import get_session

    spark = get_session(app_name="plan_audit")
    results: dict[str, dict] = {}
    violations: list[str] = []
    for name, fn in registry.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = P.explain_str(df, "simple")
        except Exception:
            results[name] = {"error": traceback.format_exc(limit=1)}
            violations.append(f"{name}: build error")
            continue
        pynodes = sorted({n for n in P.PYTHON_NODES if n in plan})
        rec = {
            "exchanges": plan.count("Exchange"),
            "scans": plan.count("FileScan"),
            "python_nodes": pynodes,
            "cartesian": "CartesianProduct" in plan,
            "bnlj": "BroadcastNestedLoopJoin" in plan,
            "build_sec": round(time.time() - t0, 2),
        }
        results[name] = rec
        if "BatchEvalPython" in pynodes:
            violations.append(f"{name}: row-at-a-time Python (BatchEvalPython)")
        if (rec["cartesian"] or rec["bnlj"]) and name not in NESTED_LOOP_OK:
            violations.append(f"{name}: nested-loop join outside ANN whitelist")
        budget = EXCHANGE_BUDGET.get(name, MAX_EXCHANGES)
        if rec["exchanges"] > budget:
            violations.append(
                f"{name}: {rec['exchanges']} exchanges (budget {budget})"
            )

    payload = {
        "sf_dir": sf_dir,
        "n_entries": len(results),
        "violations": violations,
        "entries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"{len(results)} entries, {len(violations)} violations -> {out_path}")
    for v in violations:
        print(" !", v)


if __name__ == "__main__":
    main()
