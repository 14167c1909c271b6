"""Chunking and hash-split invariants beyond the driver oracle: structural
properties (overlap reconstruction, determinism under reordering) that a
value-hash comparison can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_data_engineering_case_spark.functions.hashing import (
    portable_hash64,
    split_assign,
)
from breweries_data_engineering_case_spark.operators.chunking import chunk_documents


def test_chunk_overlap_reconstruction(spark):
    """Consecutive chunks of one doc share exactly `overlap` tokens, and
    concatenating each chunk's non-overlapping head reconstructs the doc."""
    words = [f"w{i}" for i in range(150)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=64, overlap=16)
    rows = sorted(chunks.collect(), key=lambda r: r.chunk_idx)
    # 150 tokens, step 48 -> ceil((150-16)/48) = 3 chunks
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    toks = [r.chunk_text.split(" ") for r in rows]
    assert toks[0] == words[0:64]
    assert toks[1] == words[48:112]
    assert toks[2] == words[96:150]  # short tail
    assert rows[2].n_tokens == 54
    # overlap property
    assert toks[0][-16:] == toks[1][:16]
    # reconstruction from heads
    rebuilt = toks[0][:48] + toks[1][:48] + toks[2]
    assert rebuilt == words


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.chunk_idx): r for r in chunk_documents(df).collect()
    }
    assert set(rows) == {(1, 0), (2, 0)}  # one chunk each
    assert rows[(1, 0)].chunk_text == "only three tokens"


def test_split_assign_deterministic_and_order_free(spark):
    ids = [(i,) for i in range(2000)]
    df = spark.createDataFrame(ids, "id long")
    s1 = {r.id: r.split for r in df.select("id", split_assign("id").alias("split")).collect()}
    # reversed order, different partitioning -> identical assignment
    df2 = spark.createDataFrame(list(reversed(ids)), "id long").repartition(7)
    s2 = {r.id: r.split for r in df2.select("id", split_assign("id").alias("split")).collect()}
    assert s1 == s2
    frac = {s: sum(1 for v in s1.values() if v == s) / len(s1) for s in ("train", "val", "test")}
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13
    assert 0.07 < frac["test"] < 0.13


def test_portable_hash_nonnegative(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    mn = df.select(F.min(portable_hash64("id")).alias("m")).collect()[0].m
    assert mn >= 0
