"""Similarity search over embedding columns (LLM-pipeline extension).

Two paths, as a production ANN stack needs both:

- **Brute-force top-k** (`cosine_topk`): exact. The query side is broadcast
  (queries are few), the corpus side streams — one pass over the corpus per
  batch of queries, a window top-k per query. At 100 TB of embeddings this
  is the *baseline*: cost is O(|corpus| · |queries|) but perfectly
  data-parallel with zero shuffle on the corpus until the (tiny) top-k
  aggregation.
- **LSH-bucketed** (`cosine_topk_lsh`): the scale path. Random-hyperplane
  signatures bucket the corpus (one cheap map pass, no shuffle); queries
  only score vectors sharing a bucket, turning O(N·Q) into
  O(N·Q / 2^bits · bands) with tunable recall. Approximate: recall < 1.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_bits


def _rand_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    ``queries`` is broadcast; ties break by neighbor_id so results are fully
    deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine("__qvec", "__cvec").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_band: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector gets ``n_bands`` signatures of ``bits_per_band`` sign bits;
    a (query, vector) pair is scored only if any band matches. Corpus
    signatures are computed in a map pass (no shuffle); the join is on
    (band_idx, signature) — a normal equi-join that AQE can plan, with the
    tiny query side broadcast.
    """
    total_bits = bits_per_band * n_bands
    planes = _rand_planes(dim, total_bits, seed)

    def with_bands(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str) -> DataFrame:
        sig = hyperplane_bits(vecc, planes)
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    (F.shiftright(sig, b * bits_per_band) % (1 << bits_per_band)).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(out_vec), F.explode(bands).alias("b")
        ).select(out_id, out_vec, "b.band_idx", "b.band_sig")

    cb = with_bands(corpus, id_col, vec_col, "neighbor_id", "__cvec")
    qb = with_bands(queries, id_col, vec_col, "query_id", "__qvec")
    cand = cb.join(F.broadcast(qb), on=["band_idx", "band_sig"]).select(
        "query_id", "neighbor_id", "__qvec", "__cvec"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select("query_id", "neighbor_id", cosine("__qvec", "__cvec").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_band: int = 7,
    n_bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    LSH candidate generation (band match) followed by exact cosine verify —
    the standard near-dup sweep shape for 100 TB embedding stores: the
    all-pairs O(N²) never materializes, only bucket-local pairs do.
    """
    total_bits = bits_per_band * n_bands
    planes = _rand_planes(dim, total_bits, seed)
    sig = hyperplane_bits(vec_col, planes)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                (F.shiftright(sig, b * bits_per_band) % (1 << bits_per_band)).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    tagged = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), F.explode(bands).alias("b")
    ).select("id", "vec", "b.band_idx", "b.band_sig")

    left = tagged.alias("l")
    right = tagged.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_sig") == F.col("r.band_sig"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.vec").alias("__va"),
            F.col("r.vec").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", cosine("__va", "__vb").alias("score"))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
