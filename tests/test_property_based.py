"""Property-based tests (hypothesis) for the cleaning semantics — the
executed-assertion depth the reference's schema-only unit test lacks
(SURVEY.md §5). Examples are batched into ONE DataFrame per test case so
Spark round-trips stay cheap.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from breweries_data_engineering_case_spark.sources.rest import parse_last_page

# -- pure function: pagination parser ---------------------------------------


@given(st.integers(min_value=1, max_value=10**6))
def test_parse_last_page_roundtrip(n):
    assert parse_last_page(f'<https://x?page={n}>; rel="last"') == n


@given(st.text(max_size=200).filter(lambda s: 'rel="last"' not in s))
def test_parse_last_page_never_crashes_without_last(s):
    assert parse_last_page(s) is None


# -- Spark cleaning expressions ---------------------------------------------

_texty = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=30,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.one_of(st.none(), _texty), min_size=1, max_size=50))
def test_clean_str_blank_to_null_invariant(spark, values):
    """clean_str(x) is NULL iff trim(x) is empty/NULL; otherwise it equals
    the trimmed input (no content mutation). NOTE: SQL TRIM (Spark and
    DuckDB alike) strips ONLY ASCII spaces — not \\r/\\t/\\n like Python's
    str.strip() — so the property uses strip(' ') (hypothesis caught the
    difference)."""
    from breweries_data_engineering_case_spark.functions.cleaning import clean_str

    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [r.c for r in df.select(clean_str("v").alias("c")).collect()]
    for v, c in zip(values, out):
        expected = None if v is None or v.strip(" ") == "" else v.strip(" ")
        assert c == expected, (v, c, expected)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
            _texty,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_try_double_never_errors(spark, values):
    """try_double returns a float for parseable strings and NULL for
    garbage — it must never raise, under any input, ANSI mode included."""
    from breweries_data_engineering_case_spark.functions.cleaning import try_double

    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = [r.d for r in df.select(try_double("v").alias("d")).collect()]
    for v, d in zip(values, out):
        if d is not None:
            assert isinstance(d, float)
        else:
            if v is not None:
                try:
                    float(v.strip())
                    parseable = v.strip() != ""
                except ValueError:
                    parseable = False
                # Spark accepts a few forms Python also accepts; if Python
                # parses it, Spark should have too (modulo inf/nan keywords)
                assert not parseable or v.strip().lower() in {"nan", "inf", "-inf", "infinity", "-infinity", "+inf", "+infinity"}, v
