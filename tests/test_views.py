"""Views: stored filter/sort/hidden-column specs (base.py:1359-1470,
523-579) compiled to lazy reads."""

import pytest

from sea_serpent_spark import Table


@pytest.fixture()
def mytable(spark):
    df = spark.createDataFrame(
        [
            (1, "A", "red", None),
            (2, "B", "blue", "x"),
            (3, "C", "red", ""),
            (4, "D", "green", "y"),
            (5, "E", "blue", "xy"),
            (6, "F", "red", "z"),
        ],
        ["column1", "labels", "color", "note"],
    )
    return Table(df, "mytable", spark)


def test_view_grouped_is_terms_rewrite_to_isin(mytable):
    mytable.add_view(
        "reds_blues",
        filters=[
            {"column": "color", "filter_predicate": "is", "filter_term": "red"},
            {"column": "color", "filter_predicate": "is", "filter_term": "blue"},
        ],
    )
    out = mytable.get_view("reds_blues").to_frame()
    assert set(out["labels"]) == {"A", "B", "C", "E", "F"}


def test_view_conjunction_or(mytable):
    mytable.add_view(
        "either",
        filters=[
            {"column": "labels", "filter_predicate": "is", "filter_term": "A"},
            {"column": "color", "filter_predicate": "is", "filter_term": "green"},
        ],
        filter_conjunction="OR",
    )
    out = mytable.get_view("either").to_frame()
    assert set(out["labels"]) == {"A", "D"}


def test_view_empty_contains_hidden_sort(mytable):
    mytable.add_view(
        "noted",
        filters=[
            {"column": "note", "filter_predicate": "is_not_empty"},
            {"column": "note", "filter_predicate": "contains", "filter_term": "x"},
        ],
        hidden_columns=["color"],
        sorts=[{"column": "column1", "sort_type": "down"}],
    )
    out = mytable.get_view("noted").to_frame()
    # is_not_empty treats '' as empty (reference notnull default);
    # contains 'x' keeps rows 2 and 5; sort descending
    assert out["labels"].tolist() == ["E", "B"]
    assert "color" not in out.columns
    # hide_cols / sort toggles
    full = mytable.get_view("noted", hide_cols=False, sort=False)
    assert "color" in full.columns


def test_view_is_empty_matches_null_and_empty_string(mytable):
    mytable.add_view(
        "unnoted",
        filters=[{"column": "note", "filter_predicate": "is_empty"}],
    )
    out = mytable.get_view("unnoted").to_frame()
    assert set(out["labels"]) == {"A", "C"}


def test_view_listing_duplicates_and_errors(mytable):
    mytable.add_view("v1", filters=[])
    assert "v1" in mytable.views
    with pytest.raises(ValueError):
        mytable.add_view("v1")
    with pytest.raises(ValueError):
        mytable.get_view("missing")
    with pytest.raises(ValueError):
        mytable.add_view(
            "bad",
            filters=[{"column": "labels", "filter_predicate": "wat"}],
        )
    # int indexing (base.py:1388-1389)
    assert mytable.get_view(0) is not None


def test_view_persists_in_store(spark, tmp_path):
    import pandas as pd

    from sea_serpent_spark.mutation.store import Base

    base = Base(str(tmp_path / "wh"), spark)
    t = base.from_frame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}), "small"
    )
    t.add_view(
        "just_b",
        filters=[{"column": "v", "filter_predicate": "is", "filter_term": "b"}],
    )
    # re-open: spec came from table metadata, not the instance
    t2 = base.table("small")
    assert t2.views == ["just_b"]
    out = t2.get_view("just_b").to_frame()
    assert out["k"].tolist() == [2]
