"""Property-based tests (hypothesis) for the semantic-critical pure
functions. The reference shipped hypothesis in its test requirements but
never used it (SURVEY.md §5.1); these pin the invariants that example
tests can miss.

Spark-free: every property here targets a driver-side function whose
Python behavior IS the spec (the Spark column expressions are checked
against these same semantics by the oracle-parity suite).
"""

from __future__ import annotations

import re
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from nspc_etl_basic_spark.functions.casting import (
    DATETIME_PATTERNS_PY,
    parse_datetime_py,
)
from nspc_etl_basic_spark.naming import generate_table_name
from nspc_etl_basic_spark.operators.schema_inference import (
    _bucket_length,
    _is_decimal_py,
    _is_int_py,
)

# ---------------------------------------------------------------------------
# B7: table naming
# ---------------------------------------------------------------------------

fname = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="/\x00"),
    min_size=1,
    max_size=60,
)


@given(fname)
@settings(max_examples=300)
def test_table_name_is_sql_identifier(name):
    out = generate_table_name(f"/some/dir/{name}")
    # only word chars survive, and no leading digit
    assert re.fullmatch(r"\w*", out, flags=re.UNICODE)
    assert not re.match(r"^[0-9]", out)


@given(fname)
@settings(max_examples=300)
def test_table_name_idempotent_on_sanitized(name):
    once = generate_table_name(name)
    # a sanitized name that doesn't end in _\d{3,} must be a fixed point
    if not re.search(r"_\d{3,}$", once):
        assert generate_table_name(once) == once


@given(st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,20}", fullmatch=True), st.integers(100, 99999))
@settings(max_examples=200)
def test_table_name_strips_split_suffix(stem, n):
    # reference loader.py:860 — trailing _\d{3,} split suffixes are dropped
    assert generate_table_name(f"{stem}_{n}") == stem


# ---------------------------------------------------------------------------
# B5/B6 predicates: Python int()/Decimal() strictness IS the spec
# ---------------------------------------------------------------------------

any_str = st.text(max_size=30)


@given(any_str)
@settings(max_examples=500)
def test_int_predicate_soundness(s):
    # never raises; and every accepted value must be a clean ASCII int64
    # that round-trips (the cast stage's acceptance set — anything looser
    # would promise a type the caster can't deliver)
    ok = _is_int_py(s)
    if ok:
        v = s.strip()
        assert re.fullmatch(r"[+-]?[0-9]+", v)
        assert -(2**63) <= int(v) < 2**63


@given(st.integers(min_value=-(10**13), max_value=10**13))
@settings(max_examples=200)
def test_int_strings_accepted_and_decimal_superset(n):
    s = str(n)
    assert _is_int_py(s)
    # ints within DECIMAL(18,4)'s 14 integral digits are decimals too
    assert _is_decimal_py(s)


@given(st.integers(min_value=10**14, max_value=2**63 - 1))
@settings(max_examples=100)
def test_large_int64_is_int_but_not_decimal184(n):
    # resolution order matters: INT is checked before DECIMAL, so values
    # beyond (18,4)'s integral range still land as INT, never as a
    # decimal the caster would overflow on
    assert _is_int_py(str(n))
    assert not _is_decimal_py(str(n))


@given(
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-(10**13),
        max_value=10**13,
    )
)
@settings(max_examples=200)
def test_float_strings_are_decimal_not_int(x):
    s = repr(float(x))
    if "." in s or "e" in s or "E" in s:
        assert not _is_int_py(s)  # int('1.0') raises — reference loader.py:762
        assert _is_decimal_py(s)  # scientific notation accepted, fits (18,4)


# ---------------------------------------------------------------------------
# B3: ordered multi-format datetime chain
# ---------------------------------------------------------------------------

dt = st.datetimes(
    min_value=datetime(1700, 1, 1), max_value=datetime(2300, 12, 31)
).map(lambda d: d.replace(microsecond=0))


@given(dt, st.sampled_from(DATETIME_PATTERNS_PY))
@settings(max_examples=500)
def test_datetime_roundtrip_first_matching_pattern_wins(d, pattern):
    rendered = d.strftime(pattern)
    parsed = parse_datetime_py(rendered)
    assert parsed is not None
    # the chain may legitimately parse with an EARLIER pattern (e.g. an
    # ambiguous day<=12 dd-MM string matches MM/dd first when separators
    # collide) — but re-rendering via the SAME pattern must round-trip
    # through whichever pattern claimed it
    reparsed = None
    for p in DATETIME_PATTERNS_PY:
        try:
            reparsed = datetime.strptime(rendered, p)
            break
        except ValueError:
            continue
    assert parsed == reparsed


@given(st.text(max_size=25))
@settings(max_examples=500)
def test_datetime_never_raises_and_nan_blank_are_null(s):
    out = parse_datetime_py(s)  # must never raise
    if not s.strip() or s.strip().lower() == "nan":
        assert out is None
    if out is not None:
        assert isinstance(out, datetime)


@given(dt)
@settings(max_examples=300)
def test_us_pattern_beats_european_on_ambiguity(d):
    # precedence is semantic (loader.py:788-795): MM/dd before dd-MM
    if d.month <= 12 and d.day <= 12:
        rendered = d.strftime("%m/%d/%Y")
        parsed = parse_datetime_py(rendered)
        assert parsed is not None and parsed.month == d.month


# ---------------------------------------------------------------------------
# inference ⟷ cast consistency: the Python sample predicates must accept
# EXACTLY what the JVM cast expressions accept, or strict mode would
# reject files whose inferred type the caster can't deliver
# ---------------------------------------------------------------------------

EDGE_VALUES = [
    "12", " 12 ", "+5", "-0", "007", "1_000", "١٢٣", "৪২", "½",
    "12.0", "1e3", "-1.5e-4", "+.5", ".5", "1.", "0.00005",
    "Infinity", "-Infinity", "NaN", "nan", "", "  ", "abc", "0x10",
    "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "-9223372036854775809",
    "99999999999999.9999", "99999999999999.99995", "100000000000000.0",
    "1e30", "1e-30", "--5", "++5", "5-", "1.2.3", "1,5",
    # non-space whitespace: F.trim strips U+0020 only; the decimal cast's
    # internal trimAll strips codepoints <= U+0020; \xa0 is stripped by
    # neither (but IS stripped by Python str.strip/Decimal — the round-1
    # divergence)
    "\t12", "\n5", "12\t", " \t 7 ", "\xa07", "7\xa0", "\x0b3", "\r9",
    "\t1.5", "1.5\n", "\xa01.5", "2.5\xa0", " \x1f8 ",
]


def test_python_predicates_mirror_spark_cast(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in EDGE_VALUES], "v string")
    rows = df.select(
        "v",
        (
            F.trim("v").rlike(r"^[+-]?[0-9]+$")
            & F.trim("v").try_cast("long").isNotNull()
        ).alias("int_ok"),
        F.trim("v").try_cast("decimal(18,4)").isNotNull().alias("dec_ok"),
    ).collect()
    for r in rows:
        assert _is_int_py(r.v) == r.int_ok, f"int mismatch on {r.v!r}"
        assert _is_decimal_py(r.v) == r.dec_ok, f"decimal mismatch on {r.v!r}"


# ---------------------------------------------------------------------------
# NVARCHAR bucketing (loader.py:831-846)
# ---------------------------------------------------------------------------

@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=500)
def test_bucket_contains_and_is_monotone(n):
    b = _bucket_length(n)
    assert b >= n  # the bucket always fits the observed max
    assert b in (50, 100, 255, 500) or b == max(1000, n + 100)
    assert _bucket_length(n + 1) >= b  # monotone
