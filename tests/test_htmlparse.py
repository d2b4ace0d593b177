"""Parser equivalence tests: learnhtml_spark.htmlparse vs system libxml2.

The oracle comparison is skipped when libxml2 is unavailable; the golden
fixture tests (test_blockify_labeling.py) remain the hard contract.
"""

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

import treediff  # noqa: E402
from learnhtml_spark.htmlparse import Comment, getpath, parse_html  # noqa: E402

try:
    import oracle_libxml2

    HAVE_ORACLE = oracle_libxml2.available()
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

FIXTURES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "fixtures/*/HTML/*.html"))
)

needs_oracle = pytest.mark.skipif(not HAVE_ORACLE, reason="libxml2 not available")


@needs_oracle
@pytest.mark.parametrize("case", treediff.SYNTHETIC_CASES)
def test_synthetic_tree_equality(case):
    assert treediff.compare(case) == []
    assert treediff.compare(case, remove_comments=True, remove_pis=True) == []


@needs_oracle
@pytest.mark.parametrize("path", FIXTURES)
def test_fixture_tree_equality(path):
    html = open(path).read()
    assert treediff.compare(html) == []
    assert treediff.compare(html, remove_comments=True, remove_pis=True) == []


def test_basic_shape():
    root = parse_html("<html><body><div id=a>x<p>y</p>z</div></body></html>")
    assert root.tag == "html"
    body = root._children[0]
    div = body._children[0]
    assert div.attrib == {"id": "a"}
    assert div.text == "x"
    assert div._children[0].tag == "p"
    assert div._children[0].tail == "z"
    assert getpath(div._children[0]) == "/html/body/div/p"


def test_getpath_indices():
    root = parse_html("<body><ul><li>a</li><li>b</li></ul><p>c</p></body>")
    ul = root._children[0]._children[0]
    lis = ul._children
    assert [getpath(li) for li in lis] == [
        "/html/body/ul/li[1]",
        "/html/body/ul/li[2]",
    ]
    p = root._children[0]._children[1]
    assert getpath(p) == "/html/body/p"


def test_comments_kept_and_removed():
    html = "<div>a<!-- c -->b</div>"
    root = parse_html(html)
    div = root._children[0]._children[0]
    assert div.text == "a"
    assert div._children[0].tag is Comment
    assert div._children[0].tail == "b"
    root2 = parse_html(html, remove_comments=True)
    div2 = root2._children[0]._children[0]
    assert div2.text == "ab" and not div2._children


def test_deep_nesting_no_recursion_error():
    root = parse_html("<div>" * 5000 + "x")
    depth = 0
    node = root
    while node._children:
        node = node._children[0]
        depth += 1
    assert depth >= 5000


def test_itertext_skips_comment_content():
    root = parse_html("<div>a<!-- zz -->b<span>c</span>d</div>")
    div = root._children[0]._children[0]
    assert "".join(div.itertext()) == "abcd"
