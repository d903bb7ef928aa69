"""Property-based round-trip tests (hypothesis): the token codec and
the OTLP/JSON value mapping must be identities over the full attribute
value space the engine carries (strings incl. unicode, bools, int64s,
floats, flat lists)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_symbolicator_ray.codec import decode_record, encode_record
from opentelemetry_collector_symbolicator_ray.sources.otlp import (
    otlp_to_records,
    record_to_otlp,
)

# finite floats only: NaN breaks equality; infinities are not JSON.
scalar = st.one_of(
    st.text(max_size=40),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
value = st.one_of(scalar, st.lists(scalar, max_size=6))
attrs = st.dictionaries(st.text(min_size=1, max_size=30), value, max_size=8)

log_record = st.fixed_dictionaries(
    {"event_name": st.text(max_size=20), "attributes": attrs, "resource_attributes": attrs}
)
span_record = st.fixed_dictionaries(
    {
        "event_name": st.text(max_size=20),
        "attributes": attrs,
        "resource_attributes": attrs,
        "events": st.lists(
            st.fixed_dictionaries({"name": st.text(max_size=20), "attributes": attrs}),
            max_size=3,
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(record=st.one_of(log_record, span_record))
def test_codec_roundtrip(record):
    assert decode_record(encode_record(record)) == record


@settings(max_examples=200, deadline=None)
@given(record=st.one_of(log_record, span_record))
def test_otlp_roundtrip(record):
    assert otlp_to_records(record_to_otlp(record)) == [record]
