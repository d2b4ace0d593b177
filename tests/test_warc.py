"""WARC source: framing round-trips, Content-Length authority, recovery
on truncation, gzip-member archives, and the Spark read path feeding the
extraction document model."""

import gzip
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from learnhtml_spark.sources.warc_source import (
    build_record,
    build_warc,
    http_response,
    media_url,
    parse_http_response,
    parse_warc,
    read_warc_dir,
    read_warc_docs,
    synth_media_for,
    synth_response_for,
    synth_url,
    synthesize_warc_dir,
    warc_docs_table,
    warc_media_table,
    warc_response_docs,
)


def test_roundtrip_plain_and_gz():
    ids = ["a1", "b2", "c3"]
    want_types = ["warcinfo"]
    for i in ids:
        want_types += ["request", "response"]
        if synth_media_for(i) is not None:
            want_types.append("response")
    for gz in (False, True):
        data = build_warc(ids, gz)
        if gz:
            data = gzip.decompress(data)
        recs = parse_warc(data)
        assert [h.get("warc-type") for h, _, _ in recs] == want_types
        assert all(err is None for _, _, err in recs)
        pages = {
            r[0]["warc-target-uri"]: r
            for r in recs
            if r[0].get("warc-type") == "response"
        }
        for doc_id in ids:
            hdrs, block, _ = pages[synth_url(doc_id)]
            status, ctype, body = parse_http_response(block)
            want_status, want_body = synth_response_for(doc_id)
            assert (status, body) == (want_status, want_body)
            assert ctype == "text/html; charset=utf-8"
            media = synth_media_for(doc_id)
            if media is not None:
                _, mblock, _ = pages[media_url(doc_id)]
                mstatus, mctype, mbody = parse_http_response(mblock)
                assert (mstatus, mctype, mbody) == (200, "image/png", media)


def test_interleaved_assembly_and_png_roundtrip(spark, tmp_path):
    # pick ids covering both populations (with and without media)
    ids = [f"m{i}" for i in range(12)]
    with_media = [i for i in ids if synth_media_for(i) is not None]
    without = [i for i in ids if synth_media_for(i) is None
               and synth_response_for(i)[0] == 200]
    assert with_media and without  # both populations present
    d = tmp_path / "warc"
    d.mkdir()
    (d / "a.warc").write_bytes(build_warc(ids, gz=False))

    docs = {r.doc_id: r.spans for r in read_warc_docs(spark, str(d)).collect()}
    for i in with_media:
        spans = docs[synth_url(i)]
        assert [s.kind for s in spans] == ["html", "media"]
        assert spans[1].media_ref == media_url(i)
        assert spans[1].offset == 1
    for i in without:
        assert [s.kind for s in docs[synth_url(i)]] == ["html"]

    # media table carries REAL PNG bytes — our own decoder round-trips them
    import numpy as np

    from learnhtml_spark.operators.png import decode_png

    media_rows = warc_media_table(read_warc_dir(spark, str(d))).collect()
    assert {r.media_ref for r in media_rows} == {media_url(i) for i in with_media}
    for r in media_rows:
        doc_id = r.media_ref.rsplit("/", 2)[-2]
        px = decode_png(bytes(r.data))
        want = np.frombuffer(
            hashlib.md5(f"{doc_id}:png".encode()).digest() * 3, dtype=np.uint8
        ).reshape(4, 4, 3)
        assert r.content_type == "image/png"
        assert (px == want).all()


def test_content_length_authoritative():
    # a body that CONTAINS WARC framing text must not split the record
    evil = b"binary\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\npayload"
    rec = build_record("response", {"WARC-Target-URI": "u"},
                       http_response(200, "OK", "text/plain", evil))
    recs = parse_warc(rec)
    assert len(recs) == 1 and recs[0][2] is None
    _, _, body = parse_http_response(recs[0][1])
    assert body == evil


def test_truncated_tail_is_error_row():
    good = build_record("response", {"WARC-Target-URI": "u"},
                        http_response(200, "OK", "text/plain", b"x" * 50))
    truncated = good[: len(good) - 30]
    recs = parse_warc(truncated)
    assert recs[-1][2] == "truncated WARC block"
    # header truncation too
    recs = parse_warc(b"WARC/1.0\r\nWARC-Type: response")
    assert recs[-1][2] == "truncated WARC header"


def test_spark_read_matches_synth(spark, tmp_path):
    out = synthesize_warc_dir("/root/testdata/sf0.001", docs_per_file=30)
    recs = read_warc_dir(spark, out)
    docs = warc_response_docs(recs).orderBy("url").collect()
    import pandas as pd

    ids = sorted(
        str(d)
        for d in pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )["doc_id"]
    )
    assert len(docs) == len(ids)
    for row, doc_id in zip(docs, sorted(ids, key=synth_url)):
        status, body = synth_response_for(doc_id)
        assert row.url == synth_url(doc_id)
        assert row.status == status
        assert row.n_bytes == len(body)
        assert row.body_md5 == hashlib.md5(body).hexdigest()
    # non-response records are present but filtered
    by_type = {
        r["warc_type"]: r["count"]
        for r in recs.groupBy("warc_type").count().collect()
    }
    assert by_type["request"] == len(ids)
    assert by_type["warcinfo"] >= 2  # one per archive file


def test_archive_poison_row(spark, tmp_path):
    d = tmp_path / "warc"
    d.mkdir()
    (d / "good.warc").write_bytes(build_warc(["ok1"], gz=False))
    (d / "bad.warc.gz").write_bytes(b"\x1f\x8b\x08\x00garbage-not-gzip")
    rows = read_warc_dir(spark, str(d)).collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].path.endswith("bad.warc.gz")
    assert errs[0].record_index == -1
    oks = [r for r in rows if r.warc_type == "response"]
    assert len(oks) == 1


def test_end_to_end_extract_spans(spark):
    # full pipeline: archive bytes -> heuristic spans; every verdict of the
    # synthetic page layout is predictable (nav dropped by link density,
    # heading kept only via neighbor smoothing, paragraph kept, footer
    # dropped) — the same statement the driver oracle makes in SQL
    out = synthesize_warc_dir("/root/testdata/sf0.001", docs_per_file=30)
    from learnhtml_spark.operators.heuristic import heuristic_extract_spans

    rows = (
        heuristic_extract_spans(read_warc_docs(spark, out))
        .orderBy("doc_id", "offset")
        .collect()
    )
    import pandas as pd

    ids = sorted(
        str(d)
        for d in pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )["doc_id"]
    )
    ids200 = [i for i in ids if synth_response_for(i)[0] == 200]
    n_media = sum(1 for i in ids200 if synth_media_for(i) is not None)
    assert len(rows) == 2 * len(ids200) + n_media
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id in ids200:
        h = hashlib.md5(f"{doc_id}:warc".encode()).hexdigest()
        got = by_doc[synth_url(doc_id)]
        want = [
            ("text", f"Doc {doc_id} crawl report", None, 0),
            (
                "text",
                f"Paragraph {h[:12]} for {doc_id} retains sixteen "
                "deterministic tokens covering corpus fetch parse extract "
                "verify stages end to end.",
                None,
                1,
            ),
        ]
        if synth_media_for(doc_id) is not None:
            # the page asset rides through extraction in reading order
            want.append(("media", "", media_url(doc_id), 2))
        assert [(r.kind, r.text, r.media_ref, r.offset) for r in got] == want


def test_docs_table_feeds_extraction(spark):
    out = synthesize_warc_dir("/root/testdata/sf0.001", docs_per_file=30)
    docs = warc_docs_table(read_warc_dir(spark, out))
    from learnhtml_spark.operators.heuristic import heuristic_extract_spans

    n200 = docs.count()
    rows = heuristic_extract_spans(docs).collect()
    # every body parses without a poison row (short pages may yield no
    # kept spans under the density rules — that's the point)
    assert not any(r.kind == "error" for r in rows)
    assert n200 > 0
    sample = docs.select("spans").first()["spans"]
    assert sample[0]["kind"] == "html" and "<html>" in sample[0]["text"]


def test_parse_never_raises_fuzz():
    # recovery contract: ANY truncation or byte corruption of an archive
    # parses to a record list (errors surface as rows, never exceptions)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    data = build_warc(["f1", "f2", "f3"], gz=False)

    @settings(max_examples=300, deadline=None)
    @given(
        cut=st.integers(min_value=0, max_value=len(data)),
        pos=st.integers(min_value=0, max_value=len(data) - 1),
        byte=st.integers(min_value=0, max_value=255),
    )
    def check(cut, pos, byte):
        mutated = bytearray(data[:cut])
        if pos < len(mutated):
            mutated[pos] = byte
        recs = parse_warc(bytes(mutated))
        assert isinstance(recs, list)
        for hdrs, block, err in recs:
            if err is None and "content-length" in hdrs:
                try:
                    clen = int(hdrs["content-length"])
                except ValueError:
                    clen = 0  # parser treats unparseable lengths as 0
                assert len(block) == clen

    check()


def test_cdx_index_and_random_access(spark, tmp_path):
    # index every record of plain AND gzip-member archives, then fetch
    # each one by its byte span alone and compare against the full scan
    ids = [f"c{i}" for i in range(8)]
    d = tmp_path / "warc"
    d.mkdir()
    paths = {}
    for name, gz in (("a.warc", False), ("b.warc.gz", True)):
        p = d / name
        p.write_bytes(build_warc(ids, gz))
        paths[name] = str(p)

    from learnhtml_spark.sources.warc_source import (
        fetch_record,
        read_warc_cdx,
        warc_cdx,
    )

    idx_rows = read_warc_cdx(spark, str(d)).collect()
    by_archive = {}
    for r in idx_rows:
        by_archive.setdefault(os.path.basename(r.archive), []).append(r)

    for name, gz in (("a.warc", False), ("b.warc.gz", True)):
        data = open(paths[name], "rb").read()
        full = parse_warc(gzip.decompress(data) if gz else data)
        rows = sorted(by_archive[name], key=lambda r: r.offset)
        assert len(rows) == len(full)  # every record indexed
        # spans tile the file exactly (no gaps, no overlaps)
        assert rows[0].offset == 0
        for a, b in zip(rows, rows[1:]):
            assert a.offset + a.length == b.offset
        assert rows[-1].offset + rows[-1].length == len(data)
        for row, (hdrs, block, err) in zip(rows, full):
            assert err is None
            assert row.warc_type == hdrs.get("warc-type")
            got_hdrs, got_block = fetch_record(
                paths[name], row.offset, row.length
            )
            assert got_hdrs == hdrs and got_block == block

    # the pure function agrees with the distributed reader
    data = open(paths["a.warc"], "rb").read()
    assert len(warc_cdx(data, False)) == len(by_archive["a.warc"])
