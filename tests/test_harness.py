"""The verification harness itself: canonicalization must be injective
(a collision here turns a wrong gate result into a false PASS)."""

from __future__ import annotations

import datetime
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import canon_value, hash_rows  # noqa: E402


def test_distinct_value_classes_never_collide():
    values = [
        None, "NULL", "None", "", 0, 1, True, False, "1", "true",
        2, 2.0, "2", 2.5, "2.5", float("nan"), "NaN",
        float("inf"), float("-inf"),
        datetime.date(2024, 1, 1), "2024-01-01",
        b"\x01", "\x01",
    ]
    canons = [canon_value(v) for v in values]
    # 2 and 2.0 deliberately unify (cross-engine int64/double); everything
    # else must be pairwise distinct
    assert canons[values.index(2)] == canons[values.index(2.0)]
    rest = [c for i, c in enumerate(canons) if values[i] != 2.0]
    assert len(set(rest)) == len(rest), sorted(rest)


def test_separator_in_strings_cannot_shift_fields():
    a = [("a\x1fb", "c")]
    b = [("a", "b\x1fc")]
    assert hash_rows(["x", "y"], a) != hash_rows(["x", "y"], b)


def test_escape_char_itself_is_escaped():
    # a literal backslash-x1f string must not collide with a real \x1f
    assert canon_value("a\\x1fb") != canon_value("a\x1fb")


def test_inf_does_not_crash():
    assert canon_value(float("inf")) == "n:inf"
    assert canon_value(float("-inf")) == "n:-inf"
