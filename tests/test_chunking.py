"""Chunking / top-terms / decontamination operators (training-data
pipeline family) — semantics vs straightforward Python references plus
plan-shape assertions for the 100 TB claims."""

import re

import pytest


@pytest.fixture(scope="module")
def cdocs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(95)), "en", "a"),   # 95 tokens
        (2, "alpha beta gamma", "en", "a"),                     # tiny doc
        (3, "", "en", "b"),                                     # empty
        (4, " ".join(f"w{i}" for i in range(40)), "en", "b"),   # exactly one chunk
    ]
    return spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )


def test_chunk_documents_matches_python_reference(cdocs):
    from learnhtml_spark.functions.chunking import chunk_documents

    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(cdocs, window=50, stride=40).collect()
    }
    for doc_id, text in [(1, " ".join(f"w{i}" for i in range(95))),
                         (2, "alpha beta gamma"), (3, ""),
                         (4, " ".join(f"w{i}" for i in range(40)))]:
        t = re.split(r"\s+", text.strip(" ")) if text.strip(" ") else []
        starts = list(range(0, len(t), 40))
        for ci, s in enumerate(starts):
            piece = t[s : s + 50]
            assert got[(doc_id, ci)] == (len(piece), " ".join(piece))
        assert (doc_id, len(starts)) not in got
    # doc 3 (empty) produced nothing
    assert not any(d == 3 for d, _ in got)


def test_chunk_documents_is_narrow(cdocs):
    from learnhtml_spark.functions.chunking import chunk_documents

    plan = (
        chunk_documents(cdocs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_top_terms_counts_and_ties(spark):
    from learnhtml_spark.functions.chunking import top_terms

    rows = [(1, "b a a c B"), (2, "a c\tc d")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [(r["token"], r["n"]) for r in top_terms(df, k=3).collect()]
    # a:3, b:2 (case-folded), c:3 -> top3 by (n desc, token asc): a, c, b
    assert got == [("a", 3), ("c", 3), ("b", 2)]


def test_decontaminate_flags_benchmark_overlap(spark):
    from learnhtml_spark.functions.chunking import decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, bench_text, "en", "a"),                     # benchmark doc
        (2, "totally unrelated words here today okay", "en", "a"),
        (3, bench_text + " extra tail words", "en", "b"),  # leaks 5-grams
        (4, "quick brown fox to be or not to be", "en", "b"),  # partial, no 5-gram
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(df, eval_n=1, k=5).collect()
    }
    assert set(got) == {2, 3, 4}          # benchmark doc excluded
    assert got[2] == (0, False)
    assert got[3][0] > 0 and got[3][1]
    assert got[4] == (0, False)


def test_decontaminate_broadcasts_eval_side(spark):
    from learnhtml_spark.functions.chunking import decontaminate

    rows = [(i, f"word{i} common text body here {i}", "en", "a") for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    plan = (
        decontaminate(df, eval_n=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_media_features_on_synthesized_payloads(spark):
    from learnhtml_spark.operators.multimodal import (
        media_features,
        synthesize_media,
    )

    docs = spark.createDataFrame([("d1",), ("d2",)], "doc_id string")
    out = {
        r["media_ref"]: r
        for r in media_features(
            synthesize_media(docs), deterministic_fake=False
        ).collect()
    }
    assert len(out) == 4  # one image + one audio per doc
    img = out["media://img/d1.bmp"]
    assert (img["decoder"], img["width"], img["height"]) == ("bmp", 8, 8)
    assert len(img["thumbnail"]) == 64
    aud = out["media://aud/d1.wav"]
    assert (aud["decoder"], aud["width"], aud["n_frames"]) == ("wav", 8000, 400)
    assert len(aud["thumbnail"]) == 32
    # deterministic: same doc -> same digest across runs
    out2 = {
        r["media_ref"]: r["content_digest"]
        for r in media_features(
            synthesize_media(docs), deterministic_fake=False
        ).collect()
    }
    assert out2["media://img/d1.bmp"] == img["content_digest"]


def test_chunk_documents_fuzz_matches_python_reference(spark):
    """Randomized whitespace/width fuzz of the chunk operator vs a plain
    Python implementation (same pinned space-only-trim semantics as the
    shingle fuzz test)."""
    import random

    from learnhtml_spark.functions.chunking import chunk_documents

    rng = random.Random(23)
    words = ["alpha", "b", "CC", "d-d", "1234", "x!", "longishword"]
    rows = []
    for i in range(50):
        n = rng.randint(0, 30)
        text = "".join(
            rng.choice([" ", "  ", "\t", "\n"]) + rng.choice(words)
            for _ in range(n)
        )
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for window, stride in ((7, 5), (4, 4), (3, 8)):
        got = {
            (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(df, window=window, stride=stride).collect()
        }
        want = {}
        for doc_id, text in rows:
            t = text.strip(" ")
            toks = re.split(r"\s+", t) if len(t) else []
            for ci, s in enumerate(range(0, len(toks), stride)):
                piece = toks[s : s + window]
                want[(doc_id, ci)] = (len(piece), " ".join(piece))
        assert got == want, (window, stride)
