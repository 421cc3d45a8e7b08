"""Link / rollup tests — F3 fixture shape (FIXTURES.md): bodies ⟵ labels
with skew (some bodies unmatched, some with many labels)."""

import pandas as pd
import pytest

from sea_serpent_spark import Base


@pytest.fixture()
def linked(spark, tmp_path):
    base = Base(str(tmp_path / "wh"), spark, user="tester")
    bodies = pd.DataFrame(
        {
            "body_id": [1, 2, 3, 4, 5],
            "name": ["a", "b", "c", "d", "e"],
            "size": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    labels = pd.DataFrame(
        {
            "body_ref": [1, 1, 1, 2, 3, 3, 9],  # 4,5 unmatched; 9 dangling
            "label": ["x", "y", "z", "u", "v", "w", "qq"],
            "score": [1.0, 2.0, None, 4.0, 5.0, 6.0, 7.0],
        }
    )
    tb = base.from_frame(bodies, "bodies")
    tl = base.from_frame(labels, "labels_tbl")
    return base, tb, tl


def _by_body(base, col):
    t = base.table("bodies")
    pdf = t.to_frame().sort_values("body_id")
    return pdf.set_index("body_id")[col]


def test_link_multi_match(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    s = _by_body(base, "labels_link")
    assert [len(v) for v in s] == [3, 1, 2, 0, 0]  # empty for unmatched


def test_link_first_match(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "first_link", multi_match=False)
    s = _by_body(base, "first_link")
    # first by labels _seq (insertion order): body 1 -> first label row
    assert [len(v) for v in s] == [1, 1, 1, 0, 0]
    lab = base.table("labels_tbl").to_frame().sort_values("_seq")
    first_id = lab.index[0]
    assert s.loc[1][0] == first_id


def test_rollup_count_links(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    tb.add_linked_column("labels_link", "count_links", name="n_labels")
    assert _by_body(base, "n_labels").tolist() == [3, 1, 2, 0, 0]


def test_rollup_lookup(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    tb.add_linked_column("labels_link", "lookup", "label", name="label_names")
    s = _by_body(base, "label_names")
    assert sorted(s.loc[1]) == ["x", "y", "z"]
    assert list(s.loc[4]) == [None] or len(s.loc[4]) == 0 or s.loc[4] is None


def test_rollup_sum_avg_null_aware(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    tb.add_linked_column("labels_link", "rollup-sum", "score", name="sum_score")
    tb.add_linked_column("labels_link", "rollup-avg", "score", name="avg_score")
    sums = _by_body(base, "sum_score")
    avgs = _by_body(base, "avg_score")
    assert sums.loc[1] == 3.0  # 1+2, NULL skipped (agg null-handling)
    assert avgs.loc[1] == 1.5
    assert pd.isna(sums.loc[4])


def test_rollup_concat(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    tb.add_linked_column("labels_link", "rollup-conc", "label", name="joined")
    s = _by_body(base, "joined")
    assert s.loc[1] == "x, y, z"  # insertion order (deterministic by _seq)
    assert s.loc[3] == "v, w"


def test_rollup_minmax(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    tb.add_linked_column("labels_link", "findmin", "score", name="min_s")
    tb.add_linked_column("labels_link", "findmax", "score", name="max_s")
    assert _by_body(base, "min_s").loc[3] == 5.0
    assert _by_body(base, "max_s").loc[3] == 6.0


def test_bad_formula_rejected(linked):
    base, tb, tl = linked
    tb.link(tl, "body_id", "body_ref", "labels_link")
    with pytest.raises(ValueError):
        tb.add_linked_column("labels_link", "median")


def test_not_a_link_col(linked):
    base, tb, tl = linked
    with pytest.raises(ValueError):
        tb.add_linked_column("name", "lookup", "label")
