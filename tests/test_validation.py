"""Validator-suite parity: names/signatures/boundary semantics of the
reference's public ``validation`` API
(``/root/reference/src/data_quality/validation.py:38-363``), raising the
already-ported typed exceptions with suggestion strings; plus the CLI
argument routing (violation → exit 3, pre-Spark)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_spark.exceptions import ValidationError
from data_quality_spark.validation import (
    is_valid_string,
    validate_dict,
    validate_email,
    validate_float,
    validate_int,
    validate_not_none,
    validate_number,
    validate_path,
    validate_sequence_not_empty,
    validate_string,
    validate_threshold,
    validate_url,
)


def err(fn, *a, **k) -> ValidationError:
    with pytest.raises(ValidationError) as ei:
        fn(*a, **k)
    return ei.value


class TestNotNone:
    def test_passthrough_and_none(self):
        assert validate_not_none(0, "x") == 0
        assert validate_not_none("", "x") == ""
        e = err(validate_not_none, None, "rate")
        assert e.field == "rate" and "Suggestion" in str(e)


class TestString:
    def test_type_and_default_min(self):
        assert validate_string("a", "s") == "a"
        err(validate_string, 3, "s")
        err(validate_string, "", "s")  # min_length defaults to 1
        assert validate_string("", "s", min_length=0) == ""

    def test_length_bounds_inclusive(self):
        assert validate_string("abc", "s", min_length=3, max_length=3) == "abc"
        err(validate_string, "ab", "s", min_length=3)
        err(validate_string, "abcd", "s", max_length=3)

    def test_pattern(self):
        assert validate_string("AB12", "s", pattern=r"^[A-Z]{2}\d{2}$")
        e = err(validate_string, "ab12", "s", pattern=r"^[A-Z]{2}\d{2}$")
        assert "pattern" in str(e)


class TestNumber:
    def test_coercion_and_type(self):
        assert validate_number("3.5", "x") == 3.5
        assert validate_number(3.9, "x", number_type=int) == 3  # truncates
        assert validate_int("7", "x") == 7
        assert isinstance(validate_float(2, "x"), float)
        err(validate_number, "junk", "x")
        err(validate_int, "3.5", "x")  # int('3.5') is not an int literal

    def test_bounds_inclusive(self):
        assert validate_number(5, "x", min_value=5) == 5
        assert validate_number(5, "x", max_value=5) == 5
        err(validate_number, 4.999, "x", min_value=5)
        err(validate_number, 5.001, "x", max_value=5)

    def test_zero_gate_precedes_range(self):
        e = err(validate_number, 0, "x", min_value=0, allow_zero=False)
        assert "non-zero" in str(e)
        assert validate_number(0, "x", min_value=0) == 0

    @given(st.floats(allow_nan=False, allow_infinity=False),
           st.floats(allow_nan=False, allow_infinity=False),
           st.floats(allow_nan=False, allow_infinity=False))
    @settings(max_examples=60, deadline=None)
    def test_property_range_law(self, v, lo, hi):
        lo, hi = min(lo, hi), max(lo, hi)
        in_range = lo <= v <= hi
        try:
            out = validate_float(v, "x", min_value=lo, max_value=hi)
            assert in_range and out == v
        except ValidationError:
            assert not in_range


class TestThreshold:
    def test_scales(self):
        assert validate_threshold(0.0, "t") == 0.0
        assert validate_threshold(1.0, "t") == 1.0  # inclusive
        err(validate_threshold, 1.0001, "t")
        err(validate_threshold, -0.0001, "t")
        assert validate_threshold(100.0, "t", scale_0_to_1=False) == 100.0
        err(validate_threshold, 100.5, "t", scale_0_to_1=False)
        # the 0-1 scale rejects what the 0-100 scale accepts
        err(validate_threshold, 55, "t")
        assert validate_threshold(55, "t", scale_0_to_1=False) == 55.0


class TestSequence:
    def test_duck_typing(self):
        assert validate_sequence_not_empty([1], "s") == [1]
        assert validate_sequence_not_empty((1,), "s") == (1,)
        assert validate_sequence_not_empty("ab", "s") == "ab"  # ref law
        err(validate_sequence_not_empty, [], "s")
        err(validate_sequence_not_empty, 5, "s")
        err(validate_sequence_not_empty, iter([1]), "s")  # no __len__


class TestGuards:
    def test_is_valid_string(self):
        assert is_valid_string("x")
        assert not is_valid_string("  ")
        assert not is_valid_string(3)


class TestEmailUrl:
    def test_email(self):
        assert validate_email("a.b+c@ex-ample.org", "e")
        for bad in ("not-an-email", "a@b", "@x.com", "a@x.", 7, ""):
            err(validate_email, bad, "e")

    def test_url(self):
        assert validate_url("https://example.com", "u")
        assert validate_url("http://h:8080/p/a.t?q=1&b=2#frag", "u")
        for bad in ("ftp://x.com", "example.com", "http://", None):
            err(validate_url, bad, "u")


class TestPath:
    def test_path(self, tmp_path):
        from pathlib import Path

        p = validate_path(str(tmp_path / "f.txt"), "p")
        assert isinstance(p, Path)
        err(validate_path, str(tmp_path / "nope"), "p", must_exist=True)
        f = tmp_path / "real.txt"
        f.write_text("x")
        assert validate_path(str(f), "p", must_exist=True) == f
        err(validate_path, None, "p")


class TestDict:
    def test_keys(self):
        assert validate_dict({"a": 1}, "d") == {"a": 1}
        err(validate_dict, [1], "d")
        assert validate_dict({"a": 1, "b": 2}, "d", required_keys=["a"])
        e = err(validate_dict, {"a": 1}, "d", required_keys=["a", "b"])
        assert "b" in str(e)
        assert validate_dict({"a": 1}, "d", allowed_keys=["a", "b"])
        e = err(validate_dict, {"a": 1, "z": 2}, "d", allowed_keys=["a"])
        assert "z" in str(e)


class TestCliRouting:
    def test_bad_val_frac_exits_3_before_spark(self, monkeypatch, capsys):
        import data_quality_spark.cli as cli

        def boom(*a, **k):  # a session must never start on bad input
            raise AssertionError("Spark session started on invalid args")

        monkeypatch.setattr("data_quality_spark.session.get_spark", boom)
        code = cli.main(["split", "--val-frac", "1.5"])
        assert code == 3
        assert "val-frac" in capsys.readouterr().err

    def test_negative_seed_exits_3(self, monkeypatch, capsys):
        import data_quality_spark.cli as cli

        monkeypatch.setattr(
            "data_quality_spark.session.get_spark",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError()))
        assert cli.main(["split", "--seed", "-1"]) == 3
