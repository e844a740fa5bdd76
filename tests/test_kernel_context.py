"""Context truth table, ported verbatim from
/root/reference/test/unit/A_helper/test_context.py:9-97 — the test
DATA is the behavioral spec being pinned (SURVEY.md par.5); upstream
piisa/pii-extract-base, Apache License 2.0."""

import pytest

from pii_extract_base_spark.kernel import context as mod
from pii_extract_base_spark.kernel.exceptions import (
    InvArgException, PiiBaseException)

TEST_TRUE = [
    ("a special number is 34512", ["special number"]),
    ("a special number is 34512", "special number"),
    ("a special number is 34512", {"value": "special number"}),
    ("a special number is 34512", {"value": "special number", "width": 20}),
    ("a special number is 34512",
     {"value": "special number", "width": [20, 20]}),
    ("a special number is 34512",
     {"value": "special number", "width": [20, 20], "type": "string"}),
    ("special numbering is 34512",
     {"value": "special number", "width": 20, "type": "string"}),
    ("a special number is 34512",
     {"value": "special number", "width": [20, 20], "type": "word"}),
    ("a special number is 34512",
     {"value": r"special\snumber", "width": [20, 20], "type": "regex"}),
    ("a special number is 34512",
     {"value": r"(?:special|standard)\snumber", "width": [20, 20],
      "type": "regex"}),
    ("special numbering is 34512",
     {"value": r"\bspecial\snumber(?:ing)?\b", "width": 30, "type": "regex"}),
]

TEST_FALSE = [
    ("a special tiny number is 34512", ["special number"]),
    ("a special number is 34512", {"value": "special number", "width": 8}),
    ("special numbering 34512",
     {"value": "special number", "width": 20, "type": "word"}),
    ("special numbering 34512",
     {"value": "special number", "width": 20, "type": "regex"}),
    ("special numbering is 34512",
     {"value": r"\bspecial\snumber(?:ing)?\b", "width": 30,
      "type": "string"}),
]

TEST_ERROR = [
    None,
    "",
    ["special number", ""],
    {"value": "special number", "width": 20, "type": "not-a-type"},
]


def test10_context_true():
    for (text, context) in TEST_TRUE:
        spec = mod.context_spec(context)
        assert mod.context_check(text, spec, 20) is True, (text, context)


def test20_context_false():
    for (text, context) in TEST_FALSE:
        spec = mod.context_spec(context)
        assert mod.context_check(text, spec, 20) is False, (text, context)


def test30_context_error():
    for context in TEST_ERROR:
        with pytest.raises(PiiBaseException):
            mod.context_spec(context)
