"""Golden tests for the per-node feature kernel (reference semantics)."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from fixtures.goldens_features import EXPECTED, SNIPPET_HTML  # noqa: E402
from learnhtml_spark.kernels.features import (  # noqa: E402
    extract_features_from_html,
    feature_columns,
)


def _frame():
    return extract_features_from_html(SNIPPET_HTML, 2, 2).set_index("path")


def test_feature_columns_order():
    cols = feature_columns(2, 2)
    assert cols[:3] == ["depth", "sibling_pos", "tag"]
    assert cols[10] == "descendant1_no_nodes"
    assert cols[-1] == "path"
    df = extract_features_from_html(SNIPPET_HTML, 2, 2)
    assert list(df.columns) == cols


def test_feature_goldens():
    feats = _frame()
    for col, expected in EXPECTED.items():
        got = feats[col].to_dict()
        assert set(got) == set(expected), col
        for path, val in expected.items():
            g = got[path]
            if isinstance(val, float) or isinstance(g, float):
                assert math.isclose(float(g), float(val), abs_tol=1e-9), (
                    col,
                    path,
                    g,
                    val,
                )
            else:
                assert g == val, (col, path, g, val)


def test_padding_and_depth_window():
    feats = _frame()
    # root has no ancestors: padded with typed zero/empty
    assert feats.loc["/html", "ancestor1_tag"] == ""
    assert feats.loc["/html", "ancestor2_depth"] == 0
    # level-2 descendants of /html are head's + body's children
    assert feats.loc["/html", "descendant2_no_nodes"] == 4
    assert feats.loc["/html", "descendant2_tags"] == "title,script,h2,ul"


def test_text_len_subtree():
    feats = _frame()
    assert feats.loc["/html/body/ul/li[2]", "text_len"] == 3  # 'Tea'
    assert feats.loc["/html/head/title", "text_len"] == len("Sompage")
