"""Outlink extraction: reference-resolution shapes, document order,
unresolvable hrefs, and the Spark path over crawl archives."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from learnhtml_spark.functions.links import doc_outlinks, extract_outlinks
from learnhtml_spark.sources.warc_source import (
    build_warc,
    read_warc_docs,
    synth_response_for,
    synth_url,
)


def test_resolution_shapes():
    html = (
        '<html><body>'
        '<a href="/abs">a</a>'
        '<a href="http://other.example/x?q=1">b</a>'
        '<a href="//cdn.example/l">c</a>'
        '<a href="rel/path">d</a>'
        '<a href="../up">e</a>'
        '<a href="?q=2">f</a>'
        '<a href="#s">g</a>'
        "<a>no-href</a>"
        "</body></html>"
    )
    rows = doc_outlinks("https://h.example/dir/page", html)
    assert [(r[1], r[2], r[3]) for r in rows] == [
        ("/abs", "https://h.example/abs", "h.example"),
        ("http://other.example/x?q=1", "http://other.example/x?q=1",
         "other.example"),
        ("//cdn.example/l", "https://cdn.example/l", "cdn.example"),
        ("rel/path", "https://h.example/dir/rel/path", "h.example"),
        ("../up", "https://h.example/up", "h.example"),
        ("?q=2", "https://h.example/dir/page?q=2", "h.example"),
        ("#s", "https://h.example/dir/page#s", "h.example"),
    ]
    assert [r[0] for r in rows] == list(range(7))  # document order


def test_spark_outlinks_over_archives(spark, tmp_path):
    ids = ["x1", "x2", "x3", "x4"]
    d = tmp_path / "warc"
    d.mkdir()
    (d / "a.warc").write_bytes(build_warc(ids, gz=False))
    rows = extract_outlinks(read_warc_docs(spark, str(d))).collect()
    ids200 = [i for i in ids if synth_response_for(i)[0] == 200]
    assert len(rows) == 7 * len(ids200)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in ids200:
        got = sorted(by_doc[synth_url(i)], key=lambda r: r.link_pos)
        assert got[0].url == "https://corpus.example/home"
        assert got[3].dst_host == "ext.example"
        assert got[6].url == "https://corpus.example/up"
