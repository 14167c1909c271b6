"""Global physical-plan sweep over EVERY registry query — the repo-wide
invariants a single bad edit could silently break:

1. NO row-at-a-time Python (`BatchEvalPython`) anywhere, ever.
2. NO `CartesianProduct` anywhere (even the documented all-pairs baselines
   ride a broadcast nested-loop, which at least bounds one side).
3. Pandas execution nodes (`ArrowEvalPython` / `MapInPandas` /
   `FlatMapGroupsInPandas`) only in the queries that explicitly choose the
   vectorized-Python path.
4. `BroadcastNestedLoopJoin` (non-equi or all-pairs joins) only where the
   build side is bounded by construction.

Any query newly joining these lists must justify itself here.
"""

from __future__ import annotations

from breweries_data_engineering_case_spark.plans import registry

#: queries whose SEMANTICS are a non-equi / all-pairs join with a bounded
#: (broadcast) side — the documented exact baselines and scalar broadcasts
BNLJ_OK = {
    "ann_cosine_topk",  # exact baseline: ≤50 query vectors broadcast
    "embedding_near_dup_exact",  # exact all-pairs ground-truth twin
    "doc_ngram_jaccard_pairs",  # exact verification primitive, bounded ids
    "doc_levenshtein_pairs",  # bounded-subset edit-distance join
    "tpch_q22_dormant_customers",  # single-row scalar subquery broadcast
    "key_skew_profile",  # single-row totals broadcast
    "range_join_value_bands",  # 4-row band dim broadcast
    "tpch_q11_important_parts",  # single-row global-threshold broadcast
    "source_mixture_weights",  # single-row normalizer broadcast
    "hard_negative_mining",  # ≤30 anchor vectors broadcast, corpus streamed
    "doc_tfidf_top_terms",  # single-row corpus doc-count broadcast
    "market_basket_rules",  # single-row basket-total broadcast
}

#: queries that explicitly run vectorized pandas (Arrow) stages
PANDAS_OK = {
    "embedding_near_dup",  # hyperplane-sign UDF over embeddings
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_ivf",
    "grouped_zscore_pandas",  # the applyInPandas twin, by definition
    "embedding_semantic_dedup",  # k-means centroid-assign UDF
    "multimodal_feature_extract",
    "multimodal_real_codec_extract",
    "multimodal_resize",  # nearest-neighbor numpy kernel over mapInPandas
}

PANDAS_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def test_every_query_plan_obeys_global_invariants(spark, sf_dir):
    violations: list[str] = []
    for name, fn in registry.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python UDF")
        if "CartesianProduct" in plan:
            violations.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            violations.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        if any(n in plan for n in PANDAS_NODES) and name not in PANDAS_OK:
            violations.append(f"{name}: unexpected pandas/Arrow node")
    assert not violations, "\n".join(violations)
