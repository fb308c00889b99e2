"""Property-based tests (hypothesis) for the pure-Python parser fidelity
layer — stronger than the reference's example-based tests (SURVEY.md §5)."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from oe_batch_processing_spark.functions.coercion import coerce_field, js_number
from oe_batch_processing_spark.sources.csv_source import (
    CsvOptions,
    csv_to_array,
    parse_record,
)
from oe_batch_processing_spark.sources import fixed_width as fw


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_js_number_roundtrips_python_floats(x):
    assert js_number(repr(x)) == x


@given(st.integers(min_value=-(10**15), max_value=10**15))
def test_js_number_parses_integers(n):
    assert js_number(str(n)) == float(n)


@given(st.text(alphabet=st.characters(blacklist_characters=",\"'\\\r\n"), max_size=30))
def test_js_number_never_raises(s):
    v = js_number(s)
    assert isinstance(v, float) or math.isnan(v)


_plain_field = st.text(
    alphabet=st.characters(blacklist_characters=",\"'\\\r\n"), max_size=20
)


@given(st.lists(_plain_field, min_size=1, max_size=8))
def test_csv_tokenizer_roundtrips_plain_fields(fields):
    line = ",".join(fields)
    assert csv_to_array(line) == fields


@given(st.lists(_plain_field, min_size=1, max_size=6))
def test_csv_tokenizer_roundtrips_quoted_fields(fields):
    line = ",".join(f'"{f}"' for f in fields)
    assert csv_to_array(line) == fields


@given(st.lists(_plain_field.filter(lambda s: s.strip() != ""), min_size=1, max_size=6))
def test_csv_parse_record_field_count_contract(fields):
    opts = CsvOptions(csv_headers=[f"h{i}" for i in range(len(fields))])
    opts.resolve()
    parsed, err = parse_record(",".join(fields), opts)
    assert err is None
    assert list(parsed.values()) == [f.strip() for f in fields]
    # one extra field => FAILED
    parsed2, err2 = parse_record(",".join(fields + ["x"]), opts)
    assert err2 is not None and "more data fields" in err2


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh", min_size=1, max_size=5),  # value
            st.integers(min_value=1, max_value=8),  # width headroom
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=50)
def test_fw_parse_roundtrips_layout(parts):
    layout, line, pos = [], "", 1
    for i, (val, pad) in enumerate(parts):
        width = len(val) + pad
        layout.append(
            {
                "fieldName": f"f{i}",
                "type": "string",
                "startPosition": pos,
                "endPosition": pos + width - 1,
            }
        )
        line += val.ljust(width)
        pos += width
    spec = fw.validate_layout(layout)
    parsed, err = fw.parse_record(line, spec)
    assert err is None
    assert parsed == {f"f{i}": v for i, (v, _) in enumerate(parts)}
    # strict length: any truncation/extension fails
    assert fw.parse_record(line + " ", spec)[1] is not None
    assert fw.parse_record(line[:-1], spec)[1] is not None


@given(st.sampled_from(["true", "false", "TRUE", "FALSE", "True", "fAlSe"]))
def test_boolean_coercion_accepts_any_case(s):
    v, err = coerce_field(s, "boolean")
    assert err is None and isinstance(v, bool)


@given(_plain_field.filter(lambda s: s.strip().lower() not in ("true", "false")))
def test_boolean_coercion_rejects_everything_else(s):
    v, err = coerce_field(s, "boolean")
    assert err is not None


@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_number_coercion_json_roundtrip(x):
    v, err = coerce_field(repr(float(x)), "number")
    assert err is None
    assert json.loads(json.dumps(v)) == float(x)


# --- rolling-hash fingerprint algebra ---------------------------------------

def _rh(s: str, base: int = 257, mod: int = 2_147_483_647) -> int:
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


@given(st.text(max_size=50), st.text(max_size=50))
@settings(max_examples=200)
def test_rolling_fingerprint_composes(a, b):
    """Rabin-Karp identity the operator relies on for chunked/streaming use:
    fp(a+b) == (fp(a) * base^len(b) + fp(b)) mod M."""
    base, mod = 257, 2_147_483_647
    lhs = _rh(a + b)
    rhs = (_rh(a) * pow(base, len(b), mod) + _rh(b)) % mod
    assert lhs == rhs


@given(st.text(min_size=1, max_size=30))
@settings(max_examples=100)
def test_rolling_fingerprint_python_mirror_matches_sql_semantics(s):
    """ord() mirrors both engines' ascii() for any unicode codepoint the
    fold sees, so the Python mirror is a valid executable spec."""
    assert 0 <= _rh(s) < 2_147_483_647
    assert _rh(s) == _rh(s)  # deterministic


# --- FastSS deletion-neighborhood blocking ----------------------------------

def _del_keys(s: str) -> set:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _lev1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a with one insertion?
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


@given(st.text(alphabet="ab", max_size=8), st.text(alphabet="ab", max_size=8))
@settings(max_examples=500)
def test_deletion_neighborhood_blocking_never_misses(a, b):
    """The fuzzy join's candidate guarantee: any pair within edit distance 1
    shares a deletion-neighborhood key (substitution: both delete the
    differing position; indel: the longer side's deletion equals the
    shorter). Small alphabet forces dense collisions."""
    if _lev1(a, b):
        assert _del_keys(a) & _del_keys(b), (a, b)


def test_token_bucket_fold_matches_python_reference(spark):
    """Property-style check of the JVM aggregate fold against an
    independent pure-Python replay of the token-bucket recurrence on the
    real events table (sf0.001): identical admission decisions and token
    levels for every event."""
    from pyspark.sql import functions as F

    from oe_batch_processing_spark.operators.relational8 import (
        _TB_CAP_U,
        _TB_US_PER_UTOK,
        events_token_bucket_admission,
    )
    from oe_batch_processing_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["event_id"]): (r["admitted"], r["tokens_after_u"])
        for r in events_token_bucket_admission(spark, sf).collect()
    }
    rows = (
        load_table(spark, sf, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("t"))
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_id"]))
    n_checked = 0
    for uid, evts in by_user.items():
        tok, prev = _TB_CAP_U, None
        for t, eid in sorted(evts):
            avail = (
                _TB_CAP_U
                if prev is None
                else min(_TB_CAP_U, tok + (t - prev) // _TB_US_PER_UTOK)
            )
            admitted = avail >= 1_000_000
            tok = avail - 1_000_000 if admitted else avail
            prev = t
            assert got[(uid, eid)] == (admitted, tok), (uid, eid)
            n_checked += 1
    assert n_checked == len(got) == len(rows)


def test_capped_session_fold_matches_python_reference(spark):
    """Same discipline for the gap+cap sessionizer: the JVM fold's session
    assignments equal an independent Python replay."""
    from pyspark.sql import functions as F

    from oe_batch_processing_spark.operators.relational8 import (
        _SESS_GAP_US,
        _SESS_MAX_US,
        events_sessionize_capped,
    )
    from oe_batch_processing_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["event_id"]): (r["sess_idx"], r["sess_start_us"])
        for r in events_sessionize_capped(spark, sf).collect()
    }
    rows = (
        load_table(spark, sf, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("t"))
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["t"], r["event_id"]))
    for uid, evts in by_user.items():
        idx, anchor, prev = 0, None, None
        for t, eid in sorted(evts):
            if idx == 0 or t - prev > _SESS_GAP_US or t - anchor > _SESS_MAX_US:
                idx += 1
                anchor = t
            prev = t
            assert got[(uid, eid)] == (idx, anchor), (uid, eid)
