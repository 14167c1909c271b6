"""Ground-truth checks for the round-5 operators, via INDEPENDENT
brute-force twins (different algorithm than the registry queries, so a bug
in the clever path can't hide in both):

- triangle counting: degree-oriented wedge join vs the naive a<b<c
  three-way edge join;
- prefix-filtered similarity join: recall must be EXACTLY 1 vs the exact
  all-pairs Jaccard join (the PPJoin guarantee, not a probabilistic bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


def _co_supply_edges(spark, sf_dir):
    li = (
        table_scan(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 60)
        .select("l_orderkey", "l_suppkey")
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )


def test_triangle_count_matches_naive_three_way_join(spark, sf_dir):
    e = _co_supply_edges(spark, sf_dir).persist()
    e1 = e.selectExpr("u AS a", "v AS b")
    e2 = e.selectExpr("u AS b", "v AS c")
    e3 = e.selectExpr("u AS a", "v AS c")
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    naive = {
        (r.node, r.cnt)
        for r in tri.selectExpr("a AS node")
        .unionByName(tri.selectExpr("b AS node"))
        .unionByName(tri.selectExpr("c AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    oriented = {
        (r.node, r.triangles)
        for r in registry.queries()["graph_triangle_count"](spark, sf_dir).collect()
    }
    assert oriented == naive


def test_prefix_filter_equals_exact_jaccard_join(spark, sf_dir):
    d = table_scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = d.select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            inter.alias("i"),
            union.alias("u"),
        )
        .filter(F.col("i") * 5 >= F.col("u") * 3)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in registry.queries()["doc_prefix_filter_pairs"](
            spark, sf_dir
        ).collect()
    }
    # prefix filtering is exact: no false negatives AND no false positives
    assert got == exact
