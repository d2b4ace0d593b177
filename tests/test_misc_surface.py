"""Coverage tests for the smaller reference-parity surfaces: readability
scores (F9), domain parse (F8), grouped shuffle (O1), csv interchange
(S4/S5), single-doc extractor (extractor.py contract)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from pyspark.sql import functions as F

from learnhtml_spark.htmlparse import parse_html


def test_readability_scores():
    from learnhtml_spark.kernels.readability import readability_score

    root = parse_html(
        '<body><div class="article">a</div><ul id="sidebar">b</ul>'
        "<h1>t</h1><td>c</td><span>s</span></body>"
    )
    by_tag = {}
    for n in root.iter():
        if isinstance(n.tag, str):
            by_tag.setdefault(n.tag, readability_score(n))
    assert by_tag["div"] == 30  # +25 class match, +5 div
    assert by_tag["ul"] == -28  # -25 id match, -3 list
    assert by_tag["h1"] == -5
    assert by_tag["td"] == 5
    assert by_tag["span"] == 0


def test_single_doc_extractor(fixture_docs, fixture_model):
    from learnhtml_spark.extractor import HTMLExtractor
    from learnhtml_spark.kernels.labeling import get_block_ratios, get_text_blocks

    name, html, gold = fixture_docs[0]  # R578
    ex = HTMLExtractor(fixture_model)
    paths = ex.extract_from_html(html)
    ratios = dict(get_block_ratios(html, gold))
    expected_paths = [p for p, _ in get_text_blocks(html) if ratios.get(p, 0) > 0.1]
    assert paths == expected_paths
    texts = ex.extract_text_blocks(html)
    assert len(texts) == len(expected_paths)


def test_domain_parse(spark):
    from learnhtml_spark.functions.textstats import with_domain

    df = spark.createDataFrame(
        [("https://www.example.com/a/b?q=1",), ("http://sub.host.org/x",)], ["url"]
    )
    rows = {r.url: r.domain for r in with_domain(df).collect()}
    assert rows["https://www.example.com/a/b?q=1"] == "www.example.com"
    assert rows["http://sub.host.org/x"] == "sub.host.org"


def test_grouped_shuffle(spark):
    from learnhtml_spark.functions.textstats import grouped_shuffle

    df = spark.createDataFrame(
        [(d, i) for d in range(20) for i in range(3)], ["doc_id", "i"]
    )
    rows = grouped_shuffle(df, "doc_id").toPandas()
    # groups stay contiguous
    seen = []
    for d in rows["doc_id"]:
        if not seen or seen[-1] != d:
            assert d not in seen, "group split apart"
            seen.append(d)
    # deterministic
    rows2 = grouped_shuffle(df, "doc_id").toPandas()
    assert list(rows["doc_id"]) == list(rows2["doc_id"])


def test_csv_roundtrip(spark, tmp_path):
    from learnhtml_spark.sources.csv_source import read_html_csv, write_csv

    df = spark.createDataFrame(
        [("<html><body><p>hi, \"quoted\"</p></body></html>", "u1"),
         ("<div>multi\nline</div>", "u2")],
        ["html", "url"],
    )
    path = str(tmp_path / "c")
    write_csv(df, path, single_file=True)
    back = read_html_csv(spark, path)
    got = {r.url: r.html for r in back.collect()}
    assert got["u1"] == '<html><body><p>hi, "quoted"</p></body></html>'
    assert got["u2"] == "<div>multi\nline</div>"


def test_read_html_dir(spark, fixture_model):
    """S1 directory-scan source: fixture HTML dir -> docs table -> pipeline."""
    from learnhtml_spark.operators.extract import extract_content_spans
    from learnhtml_spark.sources.dir_source import read_html_dir

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "dragnet")
    docs = read_html_dir(spark, fix, prefix="dragnet-")
    rows = docs.collect()
    assert {r.doc_id for r in rows} == {
        "file://dragnet-9.html",
        "file://dragnet-R578.html",
    }
    assert all(r.spans[0].kind == "html" and len(r.spans[0].text) > 1000 for r in rows)
    out = extract_content_spans(docs, fixture_model.to_bytes()).collect()
    assert {r.doc_id for r in out} == {
        "file://dragnet-9.html",
        "file://dragnet-R578.html",
    }
