"""Rule-based document-quality signals shared across the query surface.

The Gopher repetition/length heuristics (Rae et al. 2021 §A1.1, adapted to
the single-line corpus) are used twice — as the emitted quality report
(``doc_gopher_quality``) and as the TEACHER labels the distilled linear
classifier trains against (``doc_quality_classifier_distill``). The rule
lives here exactly once so the student can never silently train on a
different rule than the filter it claims to distill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Gopher-ish thresholds — change HERE changes both the report and the
#: distillation teacher (and must re-verify both queries' oracles, which
#: replicate these constants in SQL).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_TOP_WORD_FRAC = 0.2
GOPHER_MIN_STOPWORD_FRAC = 0.005
GOPHER_STOPWORDS = ("a", "the")


def gopher_quality_signals(docs: DataFrame) -> DataFrame:
    """Per-document Gopher quality signals + composite keep flag.

    ``docs`` needs (doc_id, text). Returns one row per doc that has at
    least one space-separated word, with columns (doc_id, n_words,
    mean_word_len, n_distinct_words, top_word_frac, stopword_frac, keep).
    Ratios are int/int double divisions (bit-deterministic cross-engine —
    no float-sum ordering involved). Docs with NO words produce no row;
    callers that must label every doc left-join and coalesce keep→false
    (a zero-word doc fails the word-count floor by definition).

    Scale shape: one explode + two grouped passes, all JVM-side; the
    word-level intermediate partial-aggregates on (doc_id, word) map-side
    and the second pass groups the already-skinny per-word counts.
    """
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    g = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.sum(F.col("c") * F.length("word")).alias("__len_sum"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("__max_c"),
        F.sum(
            F.when(F.col("word").isin(*GOPHER_STOPWORDS), F.col("c")).otherwise(0)
        ).alias("__stop_c"),
    )
    n_words_d = F.col("n_words").cast("double")
    mean_word_len = F.col("__len_sum").cast("double") / n_words_d
    top_word_frac = F.col("__max_c").cast("double") / n_words_d
    stopword_frac = F.col("__stop_c").cast("double") / n_words_d
    keep = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_word_len.between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        )
        & (top_word_frac <= GOPHER_MAX_TOP_WORD_FRAC)
        & (stopword_frac >= GOPHER_MIN_STOPWORD_FRAC)
    )
    return g.select(
        "doc_id",
        "n_words",
        mean_word_len.alias("mean_word_len"),
        "n_distinct_words",
        top_word_frac.alias("top_word_frac"),
        stopword_frac.alias("stopword_frac"),
        keep.alias("keep"),
    )
