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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window

from ..caching import cached
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_bits


def _rand_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def portable_planes_int(dim: int, n_planes: int, tag: str = "annlsh") -> list[list[int]]:
    """Integer hyperplane weights derived from the md5-prefix 60-bit hash —
    the Python replica of ``functions/hashing.portable_hash64`` (same
    ``CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`` stream), so ANY
    engine regenerates the identical planes from the tag alone:
    ``w[b][j] = h(f"{tag}:{b}:{j}") % 2001 - 1000`` ∈ [-1000, 1000].
    Uniform symmetric weights give unbiased sign projections (the LSH
    guarantee needs symmetry around 0, not gaussianity)."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        [h(f"{tag}:{b}:{j}") % 2001 - 1000 for j in range(dim)]
        for b in range(n_planes)
    ]


def quantize_embedding(vec_col, scale: int = 1_000_000):
    """array<float> → array<bigint> fixed-point: ROUND(x·scale) → BIGINT,
    the NOTES.md engine-portable exact-reduction idiom (int64→anything is
    correctly rounded everywhere; the ROUND itself agrees between Spark's
    HALF_UP and DuckDB's round-half-away on doubles)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def int_hyperplane_bits(qvec_col, planes: list[list[int]]):
    """Sign bits of EXACT integer projections of a quantized (array<bigint>)
    embedding onto integer hyperplanes, packed into one BIGINT. Integer
    addition is associative — the numpy matmul's summation order cannot
    change the result (unlike the float path in
    functions/vectors.hyperplane_bits), so the bucket assignment is
    bit-replicable by any engine that sums the same integers.
    Arrow-batched pandas UDF: one (batch × dim) @ (dim × planes) int64
    matmul per batch. Overflow-safe by construction: |qx|·|w|·dim must fit
    int64 — callers keep scale·max|x|·1000·dim ≪ 2^63."""
    from pyspark.sql.functions import pandas_udf

    if len(planes) > 62:
        raise ValueError(f"at most 62 bits fit a signed long, got {len(planes)}")
    mat = np.asarray(planes, dtype=np.int64).T.copy()  # (dim, n_planes)
    weights = np.int64(1) << np.arange(len(planes), dtype=np.int64)

    @pandas_udf("long")
    def _sig(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        X = np.stack(col.to_numpy()).astype(np.int64)  # (n, dim) exact
        bits = (X @ mat) >= 0
        return pd.Series(bits.astype(np.int64) @ weights)

    c = F.col(qvec_col) if isinstance(qvec_col, str) else qvec_col
    return _sig(c)


def cosine_topk_lsh_portable(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_band: int = 4,
    n_bands: int = 8,
    tag: str = "annlsh",
    exclude_self: bool = True,
) -> DataFrame:
    """``cosine_topk_lsh`` with ENGINE-PORTABLE bucketing: integer
    fixed-point projections onto md5-seeded integer hyperplanes instead of
    float gaussian ones. Every bucket assignment (and therefore the exact
    candidate set, scores, and ranks) is replicable in plain SQL — the
    registry query's DuckDB oracle regenerates the planes from the tag and
    replays the whole pipeline, making this approximate-ANN path fully
    value-checkable, not just row-counted. Same join shape as the
    non-portable twin: corpus signatures in one map pass, candidates from
    a broadcast equi-join on (band_idx, band_sig), exact cosine re-score."""
    total_bits = bits_per_band * n_bands
    planes = portable_planes_int(dim, total_bits, tag)

    def with_bands(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str) -> DataFrame:
        # materialize the UDF signature as a bound column FIRST: the n_bands
        # struct references below would otherwise re-evaluate the UDF per
        # band (NOTES.md expression-capture gotcha)
        based = df.select(
            F.col(idc).alias(out_id),
            F.col(vecc).alias(out_vec),
            int_hyperplane_bits(quantize_embedding(vecc), planes).alias("__sig"),
        )
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    (F.shiftright(F.col("__sig"), b * bits_per_band)
                     % (1 << bits_per_band)).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )
        return based.select(out_id, out_vec, F.explode(bands).alias("b")).select(
            out_id, out_vec, "b.band_idx", "b.band_sig"
        )

    cb = with_bands(corpus, id_col, vec_col, "neighbor_id", "__cvec")
    qb = with_bands(queries, id_col, vec_col, "query_id", "__qvec")
    cand = cb.join(F.broadcast(qb), on=["band_idx", "band_sig"]).select(
        "query_id", "neighbor_id", "__qvec", "__cvec"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id", "neighbor_id", cosine("__qvec", "__cvec").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


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
    bits_per_band: int = 4,
    n_bands: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Default 8 bands × 4 bits: for a neighbor at angle θ the per-band match
    probability is (1-θ/π)^4, any-band recall 1-(1-p)^8 ≈ 0.8 at cos≈0.5.
    Wider bands (8 bits) measured recall 0.08 on the test embeddings — too
    selective; fewer bits per band trades candidate count for recall.

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


def _centroid_assign_udf(centroids):
    """pandas UDF: index of the nearest centroid (L2) per embedding —
    one numpy matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    C_norms = (C * C).sum(axis=1)

    @pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
        # argmin ||x-c||^2 = argmin (c.c - 2 x.c); ties -> lowest index (np)
        d = C_norms[None, :] - 2.0 * (X @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return assign


def _centroid_probe_udf(centroids, nprobe: int):
    """pandas UDF: indices of the ``nprobe`` nearest centroids (L2) per
    embedding, nearest first — the query-side twin of
    :func:`_centroid_assign_udf` (same distance kernel, stable tie order
    matching the driver-side ``np.argsort(kind="stable")`` it replaces)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    C_norms = (C * C).sum(axis=1)
    n = min(nprobe, len(C))

    @pandas_udf("array<int>")
    def probe(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
        d = C_norms[None, :] - 2.0 * (X @ C.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype("int32")
        return pd.Series(list(idx))

    return probe


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """K-means (Lloyd) coarse quantizer for IVF.

    Deterministic init (first k vectors by id); each iteration is one
    broadcast-assign map pass + one groupBy-mean — two jobs over the corpus,
    no driver-side data beyond the k×dim centroid matrix.
    """
    init = (
        corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [list(map(float, r[0])) for r in init]
    for _ in range(iters):
        assign = _centroid_assign_udf(centroids)
        assigned = corpus.select(assign(F.col(vec_col)).alias("__c"), vec_col)
        # mean per centroid via posexplode + avg (JVM-side), rebuilt in order
        means = (
            assigned.select("__c", F.posexplode(vec_col).alias("__i", "__x"))
            .groupBy("__c", "__i")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["__c"], {})[r["__i"]] = r["__m"]
        dim = len(centroids[0])
        centroids = [
            [by_c.get(c, {}).get(i, centroids[c][i]) for i in range(dim)]
            for c in range(len(centroids))
        ]
    return centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus is partitioned by nearest
    centroid (inverted lists); each query scores only its ``nprobe`` nearest
    lists. At 100 TB the assignment column is computed once at ingest and
    the corpus is clustered/partitioned by it on disk, so a query touches
    nprobe/k of the data; recall is tunable via nprobe."""
    cents = centroids or train_ivf_centroids(corpus, k=n_centroids, id_col=id_col, vec_col=vec_col)
    assign = _centroid_assign_udf(cents)
    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"),
        assign(F.col(vec_col)).alias("__list"),
    )

    # distributed probe assignment: the SAME argmin kernel as the corpus
    # side, widened to top-nprobe — one Arrow batch pass over the query set,
    # no driver collect (queries scale to any volume)
    probe = _centroid_probe_udf(cents, nprobe)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe(F.col(vec_col))).alias("__list"),
    )
    cand = c_assigned.join(F.broadcast(probes), on="__list")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select("query_id", "neighbor_id", cosine("__qvec", "__cvec").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with the IVF k-means quantizer, then inside each
    cluster drop every vector whose cosine to a LOWER-id cluster-mate is
    >= ``threshold`` (keep-min, same convention as the MinHash keep list).

    Returns (id, cluster, keep). The pair join is cluster-local — cost is
    Σ n_c², never corpus-wide O(N²); at 100 TB the cluster assignment is
    computed once at ingest and the corpus is hash-partitioned by cluster,
    so the self-join shuffles nothing that is not already co-located. The
    same keep-min rule applied per-cluster is embarrassingly parallel.
    """
    cents = centroids or train_ivf_centroids(
        corpus, k=n_centroids, id_col=id_col, vec_col=vec_col
    )
    assign = _centroid_assign_udf(cents)
    a = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    left = a.alias("l")
    right = a.alias("r")
    dropped = (
        left.join(
            right,
            on=[
                F.col("l.cluster") == F.col("r.cluster"),
                F.col("l.id") > F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id"),
            cosine("l.vec", "r.vec").alias("__score"),
        )
        .filter(F.col("__score") >= threshold)
        .select("id")
        .distinct()
    )
    return a.select("id", "cluster").join(
        dropped.withColumn("__dup", F.lit(True)), on="id", how="left"
    ).select(
        "id", "cluster", F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep")
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
    portable: bool = False,
    tag: str = "embnd",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    LSH candidate generation (band match) followed by exact cosine verify —
    the standard near-dup sweep shape for 100 TB embedding stores: the
    all-pairs O(N²) never materializes, only bucket-local pairs do.

    ``portable=True`` swaps gaussian planes for md5-seeded INTEGER planes
    over int64 fixed-point embeddings (see ``cosine_topk_lsh_portable``) —
    exact integer projections make the bucket assignment, and therefore the
    full verified-pair output, SQL-replicable (registry
    ``embedding_near_dup`` is value-checked against a DuckDB replay).
    """
    total_bits = bits_per_band * n_bands
    if portable:
        sig = int_hyperplane_bits(
            quantize_embedding(vec_col), portable_planes_int(dim, total_bits, tag)
        )
    else:
        sig = hyperplane_bits(vec_col, _rand_planes(dim, total_bits, seed))
    # materialize the UDF signature as a bound column before the n_bands
    # references below (expression capture would re-run the UDF per band)
    based = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("__sig")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                (F.shiftright(F.col("__sig"), b * bits_per_band)
                 % (1 << bits_per_band)).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    # candidate generation is SKINNY (id, band_idx, band_sig) — same shape
    # as the MinHash-LSH banded join: a pair matching in b bands surfaces b
    # times, and carrying the two 64-float vectors through that fan-out
    # (then deduping the wide rows) shuffled ~2 GB and ran 216 s on a
    # 10×-sf0.1 corpus whose duplicate clusters inflate bucket sizes.
    # Dedup the bare id pairs first, then re-attach each side's vector with
    # two joins against the (persisted) based table — measured 2.1× faster
    # end-to-end in that regime (216 s → 103 s, identical 159,700 pairs);
    # the residual cost is the bucket-pair enumeration itself, which is
    # inherently Σ m² over bucket sizes — on dup-heavy corpora run exact
    # dedup first (the composed pipeline in plans/registry does).
    based = based.transform(cached)
    skinny = based.select("id", F.explode(bands).alias("b")).select(
        "id", "b.band_idx", "b.band_sig"
    )
    left = skinny.alias("l")
    right = skinny.alias("r")
    cand_ids = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_sig") == F.col("r.band_sig"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = based.select(F.col("id").alias("id_a"), F.col("vec").alias("__va"))
    vb = based.select(F.col("id").alias("id_b"), F.col("vec").alias("__vb"))
    cand = cand_ids.join(va, "id_a").join(vb, "id_b")
    return (
        cand.select("id_a", "id_b", cosine("__va", "__vb").alias("score"))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def semantic_dedup_portable(
    corpus: DataFrame,
    threshold: float = 0.4,
    cluster_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tag: str = "semdd",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) with an engine-portable coarse
    quantizer: where ``semantic_dedup`` clusters with float k-means
    (Python-seeded — not SQL-replicable, hence its rows-only registry
    check), this twin derives the cluster id from the ``cluster_bits``-bit
    sign signature of EXACT integer hyperplane projections (md5-seeded
    integer planes over int64 fixed-point embeddings, the
    ``cosine_topk_lsh_portable`` machinery). Same keep-min decision rule,
    same cluster-local pair join (cost Σ n_c², never corpus-wide O(N²)),
    but every stage — cluster assignment, candidate pairs, the
    index-ordered double cosine fold — is bitwise replicable in ANSI SQL,
    so the registry query carries a full value oracle.

    At 100 TB the signature is one Arrow-batched matmul pass at ingest; the
    corpus is then hash-partitioned by cluster and the self-join shuffles
    nothing that is not already co-located. Returns (id, cluster, keep).
    """
    sig = int_hyperplane_bits(
        quantize_embedding(vec_col), portable_planes_int(dim, cluster_bits, tag)
    )
    a = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("cluster")
    )
    left, right = a.alias("l"), a.alias("r")
    dropped = (
        left.join(
            right,
            on=[
                F.col("l.cluster") == F.col("r.cluster"),
                F.col("l.id") > F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id"), cosine("l.vec", "r.vec").alias("__score"))
        .filter(F.col("__score") >= threshold)
        .select("id")
        .distinct()
    )
    return (
        a.select("id", "cluster")
        .join(dropped.withColumn("__dup", F.lit(True)), on="id", how="left")
        .select(
            "id", "cluster", F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep")
        )
    )
