"""Tests for the schema advisor + backfill suggester (reference C15/C16)."""

from __future__ import annotations

from data_quality_spark.plans.advisor import (
    advise_table,
    backfill_with_lookup,
    suggest_backfills,
)


def test_advise_table(spark):
    rows = [
        (i, f"code{i}", i % 2 == 0, float(i), None if i % 5 == 0 else i)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "row_id int, item_code string, is_active boolean, amount double, ref_id int"
    )
    a = advise_table(df, "t")
    assert a.n_rows == 100
    assert "row_id" in a.natural_keys and "item_code" in a.natural_keys
    assert "ref_id" not in a.natural_keys  # has nulls
    assert "is_active" in a.boolean_candidates
    assert a.looks_like_fact  # 2 key-ish cols + numeric majority


def test_binary_pair_and_timestamp_boolean_suggestions(spark):
    """Ref schema_analyzer.py:459-514: 2-value string columns matching a
    binary pair → suggested replacement; <prefix>*_at timestamps with a null
    gap → is_<x>ed suggestion."""
    rows = [
        (i, "active" if i % 2 else "inactive",
         None if i % 3 == 0 else "2026-01-01")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "pk int, status string, fetch_at string"
    )
    a = advise_table(df, "t")
    assert a.suggested_booleans.get("status") == "active/inactive"
    assert a.suggested_booleans.get("fetch_at") == "is_fetched"


def test_denormalization_prefix_detection(spark):
    """Ref schema_analyzer.py:517-560: repeated artist_* prefix → extract
    into an artists table; created_*/is_* prefixes exempt."""
    df = spark.createDataFrame(
        [(1, "a", "US", "rock", "2026-01-01", "2026-01-02")],
        "id int, artist_name string, artist_country string, artist_genre string, "
        "created_at string, created_by string",
    )
    a = advise_table(df, "songs")
    prefixes = {d["prefix"]: d for d in a.denormalization}
    assert "artist" in prefixes
    assert prefixes["artist"]["suggested_table"] == "artists"
    assert set(prefixes["artist"]["columns"]) == {
        "artist_name", "artist_country", "artist_genre"
    }
    assert "created" not in prefixes


def test_impossible_column_patterns():
    """P3: the reference's full 29-pattern list (advanced_analysis.py:166-196),
    unanchored case-insensitive search semantics."""
    from data_quality_spark.plans.advisor import (
        identify_impossible_columns,
        is_column_likely_impossible,
    )

    assert is_column_likely_impossible("sentiment_score")
    assert is_column_likely_impossible("raw_response")
    assert is_column_likely_impossible("api_key")          # .*_key
    assert is_column_likely_impossible("Analysis_Result")  # IGNORECASE prefix
    assert is_column_likely_impossible("session_token")
    assert not is_column_likely_impossible("name")
    assert not is_column_likely_impossible("isrc")
    got = identify_impossible_columns(
        {
            "songs": ["id", "title", "cached_plays", "debug_info"],
            "artists": ["id", "name"],
        }
    )
    assert got == {"songs": ["cached_plays", "debug_info"]}


def test_suggest_and_apply_backfill(spark):
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, "beta", 20), (3, "alpha", None), (4, "gamma", 40)],
        "pk int, name string, ext_id int",
    )
    lookup = spark.createDataFrame(
        [("alpha", 100), ("beta", 200)], "name string, ext_id int"
    )
    sugg = suggest_backfills(df, "t", {"ext_id": ("lk", "name", "ext_id")})
    assert len(sugg) == 1
    assert sugg[0]["null_count"] == 2 and sugg[0]["strategy"] == "lookup_join"

    fixed = backfill_with_lookup(df, "ext_id", lookup, "name", "ext_id")
    got = {r.pk: r.ext_id for r in fixed.collect()}
    # nulls filled from lookup; existing values untouched
    assert got == {1: 100, 2: 20, 3: 100, 4: 40}
    assert fixed.filter("ext_id IS NULL").count() == 0
