"""JS parser conformance corpus (44 browser stack formats), ported from
the reference's sourcemapprocessor/stack_trace_parser_test.go:20-888
(itself adapted from MIT-licensed TraceKit).  The case table lives in
tests/data/js_parser_corpus.json; every case asserts name/message/mode
and the full frame list including nullable line/column."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from opentelemetry_collector_symbolicator_ray.functions.js_stack_parser import (
    JsParseError,
    compute_stack_trace,
)

_DATA = Path(__file__).parent / "data"
CASES = json.loads((_DATA / "js_parser_corpus_a.json").read_text()) + json.loads(
    (_DATA / "js_parser_corpus_b.json").read_text()
)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_js_stack_parser(case):
    if case["expect_error"]:
        with pytest.raises(JsParseError):
            compute_stack_trace(case["exception_name"], case["exception_msg"], case["stack"])
        return

    result = compute_stack_trace(case["exception_name"], case["exception_msg"], case["stack"])
    assert result.name == case["expected_name"]
    assert result.message == case["expected_message"]
    assert result.mode == case["expected_mode"]
    got = [[f.url, f.func_name, f.line, f.column] for f in result.frames]
    assert got == case["expected_frames"]


def test_corpus_size():
    """The reference corpus covers Safari/Firefox/Chrome/IE/Opera/
    PhantomJS/React Native plus edge cases — keep all 44."""
    assert len(CASES) == 44
