"""Near-duplicate detection over text (LLM-pipeline extension).

Four families, each a standard large-scale training-data dedup technique:

- **Exact**: md5 fingerprint hash-groupBy (operators in registry:
  ``doc_dedup_exact``) — partial agg dedups map-side.
- **MinHash + LSH** (`minhash_signatures`, `minhash_lsh_pairs`): word-shingle
  sets → k seeded min-hashes → banded signatures → bucket-join candidates →
  exact Jaccard verify. The all-pairs O(N²) never materializes; the only
  shuffle is the bucket join on (band_idx, band_hash), whose fan-out is
  controlled by bands×rows.
- **SimHash** (`simhash64`): per-token hash sign-votes per bit → one 2^bits
  packed integer per document; near-dups share or almost-share the value.
  Everything is JVM array expressions — one map pass, no shuffle, no UDF.
- **N-gram Jaccard** (`ngram_jaccard_pairs`): exact set-similarity join for
  modest candidate sets (or verification of LSH candidates).

Determinism: MinHash uses xxhash64 (Spark-internal — no SQL oracle;
rows-only driver check). SimHash and Jaccard are built from md5/set algebra
that DuckDB reproduces exactly, so they ARE oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(c: Column | str, pattern: str = r"\s+") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(col), pattern)


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of the text (n=1 → token set)."""
    toks = tokens(c)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard |A∩B| / |A∪B| in exact integer arithmetic → one double
    division (cross-engine deterministic)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def _seeded_hash(i: int):
    """Unary lambda factory: pyspark binds a second lambda parameter to the
    array index, so the seed must be closed over, never a default arg."""
    return lambda s: F.xxhash64(s, F.lit(i))


def _minhash_sig(shingles: Column, num_hashes: int) -> Column:
    return F.array(
        *[F.array_min(F.transform(shingles, _seeded_hash(i))) for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — sig[i] = min over shingles of
    xxhash64(shingle, i). Pure expressions; one map pass."""
    sh = word_shingles(text_col, shingle_n)
    return df.select(F.col(id_col).alias("id"), _minhash_sig(sh, num_hashes).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verified near-dup pairs (id_a < id_b, jaccard >= threshold).

    bands×rows = num_hashes; candidate pairs come from any band collision,
    then exact shingle-set Jaccard verifies (no false positives; false
    negatives bounded by the (1-t^r)^b LSH curve).
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(text_col, shingle_n)
    base = df.select(F.col(id_col).alias("id"), sh.alias("shingles"))
    with_sig = base.select(
        "id", "shingles", _minhash_sig(F.col("shingles"), num_hashes).alias("sig")
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    F.concat_ws(
                        ",", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                               for r in range(rows_per_band)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = with_sig.select("id", "shingles", F.explode(band_arr).alias("b")).select(
        "id", "shingles", "b.band_idx", "b.band_hash"
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.shingles").alias("__sa"),
            F.col("r.shingles").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _md5_token_hash(tok: Column) -> Column:
    """Engine-portable 60-bit token hash: first 15 hex chars of md5.

    Matches DuckDB ``CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)``, so
    SimHash built on it is oracle-checkable cross-engine."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) — per-bit sign votes over md5-based token hashes,
    packed into a BIGINT. Pure map-side expressions (fold over the token
    hash array per bit); near-identical documents land on equal or
    near-equal values (Hamming distance ≈ edit distance)."""
    toks = tokens(text_col)
    hashes = F.transform(toks, _md5_token_hash)
    packed = F.lit(0).cast("long")
    for i in range(bits):
        # bit i of (positive) h as modulo arithmetic — F.shiftright cannot
        # take a lambda-variable Column, and h < 2^60 is always positive,
        # so (h % 2^(i+1)) >= 2^i ⇔ (h >> i) & 1. The merge lambda must be
        # built by a factory: pyspark counts lambda parameters, so default
        # args are not allowed.
        def _merge(lo: int, hi: int):
            return lambda acc, h: acc + F.when(
                (h % F.lit(hi)) >= F.lit(lo), F.lit(1)
            ).otherwise(F.lit(-1))

        vote = F.aggregate(hashes, F.lit(0).cast("long"), _merge(1 << i, 1 << (i + 1)))
        packed = packed + F.when(vote > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.select(F.col(id_col).alias("id"), packed.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (id_a < id_b, jaccard >= t).

    O(N²) — for bounded candidate sets or small corpora; the scale path is
    minhash_lsh_pairs. Set ops (array_intersect/union) are distinct-element
    semantics in both Spark and DuckDB."""
    sh = word_shingles(text_col, shingle_n)
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
    )
    return pairs.filter(F.col("jaccard") >= threshold)
