"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen) — language ID, quality
scoring, token counting, fingerprinting. These extend the reference's surface
(it has no text functions, SURVEY.md §2.8) toward the LLM-data workload the
engine targets; they run over the shared ``documents`` table.

Determinism: every function is per-row arithmetic/regex (no aggregation), so
results are bit-identical across engines — each has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
#: Deliberately small + deterministic (no external model); real deployments
#: swap in fastText et al. via the multimodal UDF path.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(c: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(_col(c))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def word_hits(c: Column | str, words: tuple[str, ...]) -> Column:
    """How many of ``words`` occur as whole tokens in the text (0..len)."""
    t = _col(c)
    hit = None
    for w in words:
        h = F.when(t.rlike(rf"(^|\s){w}(\s|$)"), F.lit(1)).otherwise(F.lit(0))
        hit = h if hit is None else hit + h
    return hit.cast("int")


def lang_id(c: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits, 'und' when
    nothing matches. Ties break by the fixed language order (en,es,de,fr)."""
    scores = {lang: word_hits(c, ws) for lang, ws in LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fixed iteration order ⇒ deterministic tie-break: earlier lang wins ties
    for lang, score in scores.items():
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def punct_ratio(c: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    t = _col(c)
    n = F.length(t)
    p = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def alpha_ratio(c: Column | str) -> Column:
    """Alphabetic chars / total chars (0 for empty text)."""
    t = _col(c)
    n = F.length(t)
    a = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(a.cast("double") / n.cast("double"))


def quality_score(c: Column | str, stop_words: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Composite [0,1] quality score: length signal + alpha ratio + stopword
    presence − punctuation excess. Deterministic per-row double arithmetic."""
    t = _col(c)
    n_tokens = token_count(t)
    len_sig = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_sig = F.least(word_hits(t, stop_words).cast("double") / F.lit(3.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_sig + F.lit(0.4) * alpha_ratio(t) + F.lit(0.2) * stop_sig
        - F.lit(0.2) * punct_ratio(t)
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(c))
