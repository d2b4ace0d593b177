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
    assert len(out) == 6  # one BMP + one PNG + one audio per doc
    img = out["media://img/d1.bmp"]
    assert (img["decoder"], img["width"], img["height"]) == ("bmp", 8, 8)
    assert len(img["thumbnail"]) == 64
    png = out["media://img/d1.png"]
    assert (png["decoder"], png["width"], png["height"]) == ("png", 8, 8)
    assert len(png["thumbnail"]) == 64 and png["error"] is None
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


def test_stratified_sample_exact_counts_and_determinism(spark):
    from learnhtml_spark.functions.sampling import stratified_sample

    rows = [(i, f"s{i % 3}") for i in range(100)] + [
        (1000 + i, "big") for i in range(400)  # skewed stratum
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string").withColumn(
        "text", __import__("pyspark").sql.functions.lit("x")
    )
    out1 = {(r["doc_id"], r["source"]) for r in stratified_sample(df, 1, 5).collect()}
    out2 = {(r["doc_id"], r["source"]) for r in stratified_sample(df, 1, 5).collect()}
    assert out1 == out2  # deterministic
    per = {}
    for _, s in out1:
        per[s] = per.get(s, 0) + 1
    # exact floor(n/5) per stratum: 34,33,33 docs in s0..s2 -> 6,6,6; big 400 -> 80
    assert per == {"s0": 6, "s1": 6, "s2": 6, "big": 80}
    # matches the naive window reference
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hv = (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483647)
    w = Window.partitionBy("source").orderBy(hv, "doc_id")
    naive = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("source"))
    ).filter(F.col("rk") * 5 <= F.col("n"))
    want = {(r["doc_id"], r["source"]) for r in naive.collect()}
    assert out1 == want


def test_stratified_sample_no_whole_stratum_window(spark):
    from learnhtml_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(60)], "doc_id long, source string"
    )
    plan = (
        stratified_sample(df)._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_chunk" in line.split("windowspecdefinition")[-1]


def test_queries_and_oracles_stay_consistent():
    """Every oracle key must be a registered query; rows-only queries
    (no oracle) must be the documented set — guards key drift between
    the two dicts as operators accumulate."""
    import __spark_entry__ as E

    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q, o - q
    assert q - o == {"media_features"}, q - o


def test_chunk_documents_edge_params(spark):
    import pytest as _pytest

    from learnhtml_spark.functions.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, window=0, stride=5)
    with _pytest.raises(ValueError):
        chunk_documents(df, window=5, stride=0)
    # window much larger than any doc: one chunk per doc, full text
    got = chunk_documents(df, window=1000, stride=1000).collect()
    assert len(got) == 1 and got[0]["chunk_text"] == "a b c"


def test_stratified_sample_full_fraction_keeps_everything(spark):
    import pytest as _pytest

    from learnhtml_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(40)], "doc_id long, source string"
    )
    out = {(r["doc_id"], r["source"]) for r in stratified_sample(df, 1, 1).collect()}
    assert out == {(i, f"s{i % 3}") for i in range(40)}
    with _pytest.raises(ValueError):
        stratified_sample(df, 2, 1)
    with _pytest.raises(ValueError):
        stratified_sample(df, 0, 5)


def test_grouped_cumsum_matches_naive_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from learnhtml_spark.functions.windows import grouped_cumsum

    rows = [(i, f"s{i % 3}", (i * 7) % 13 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    got = {
        (r["doc_id"], r["source"]): r["cum"]
        for r in grouped_cumsum(
            df, group="source", order="doc_id", value="v", num_partitions=7
        ).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r["doc_id"], r["source"]): r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want
    # skew guard: the full-data window must key on (_chunk, group)
    plan = (
        grouped_cumsum(df, "source", "doc_id", "v", num_partitions=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower()


def test_pack_sequences_invariants(spark):
    """Concat-then-chunk packing: per-bucket offsets are the exclusive
    cumsum in doc_id order; bins derive by integer division; zero-token
    docs pack nothing."""
    from learnhtml_spark.functions.chunking import pack_sequences

    rows = [(i, "tok " * ((i * 11) % 30)) for i in range(200)]
    rows.append((900, ""))  # zero tokens -> excluded
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity=16, n_buckets=4).collect()
    assert all(r["doc_id"] != 900 for r in out)
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    total_docs = sum(1 for i, t in rows if t.strip())
    assert sum(len(v) for v in by_bucket.values()) == total_docs
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rs:
            assert r["start_tok"] == run
            assert r["first_bin"] == r["start_tok"] // 16
            assert r["last_bin"] == (r["start_tok"] + r["n_tokens"] - 1) // 16
            assert r["first_bin"] <= r["last_bin"]
            run += r["n_tokens"]


def test_bloom_decontaminate_semantics_and_superset(spark):
    """Bloom verdicts: same hand-checked corpus as decontaminate — the
    leaking doc is flagged; and corpus-wide the bloom has NO false
    negatives (exact-contaminated => bloom-contaminated)."""
    from learnhtml_spark.functions.chunking import (
        bloom_decontaminate,
        decontaminate,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, bench_text, "en", "a"),
        (2, "totally unrelated words here today okay", "en", "a"),
        (3, bench_text + " extra tail words", "en", "b"),
        (4, "quick brown fox to be or not to be", "en", "b"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    got = {
        r["doc_id"]: r
        for r in bloom_decontaminate(df, eval_n=1, k=5).collect()
    }
    assert set(got) == {2, 3, 4}
    assert got[3]["contaminated"] and got[3]["n_hits"] > 0
    assert got[3]["n_grams"] >= got[3]["n_hits"]

    exact = {r["doc_id"]: r["contaminated"] for r in decontaminate(df, eval_n=1, k=5).collect()}
    bloom = {r["doc_id"]: r["contaminated"] for r in got.values()}
    for d, c in exact.items():
        if c:
            assert bloom[d], f"bloom false negative on doc {d}"


def test_bloom_decontaminate_probe_side_is_joinless(spark):
    """The bitmap is a plan literal: the corpus probe must not join a
    bloom-word table — the only joins in the plan are the broadcast
    eval-id anti/semi joins and the zero-hit restore."""
    from learnhtml_spark.functions.chunking import bloom_decontaminate

    rows = [(i, f"word{i} common text body here {i}", "en", "a") for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    out = bloom_decontaminate(df, eval_n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only shuffle join is the zero-hit restore on doc_id (both
    # sides per-doc at scale — correctly NOT broadcast); the probe
    # itself joins nothing: the bitmap ran eagerly at build time and
    # appears only as an element_at against an array literal
    assert plan.count("SortMergeJoin") <= 1
    assert "bit_or" not in plan
    assert "element_at" in plan


def test_bloom_decontaminate_validates_params(spark):
    import pytest as _pytest

    from learnhtml_spark.functions.chunking import bloom_decontaminate

    df = spark.createDataFrame([(1, "a", "en", "s")],
                               "doc_id int, text string, lang string, source string")
    with _pytest.raises(ValueError, match="multiple of 32"):
        bloom_decontaminate(df, m_bits=100)
    with _pytest.raises(ValueError, match="n_hash"):
        bloom_decontaminate(df, n_hash=0)


def test_bloom_decontaminate_fuzz_matches_python_reference(spark):
    """Seeded random corpus vs a pure-Python Bloom built with the same
    md5-half double hashing — verdicts (including any false positives)
    must agree exactly."""
    import hashlib
    import random
    import re

    from learnhtml_spark.functions.chunking import bloom_decontaminate

    rng = random.Random(77)
    vocab = ["tok%d" % i for i in range(12)] + ["Mixed", "UP"]
    rows = []
    for i in range(40):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eval_n, k, m, nh = 5, 3, 4096, 3

    def grams(text):
        t = text.lower().strip(" ")
        toks = re.split(r"\s+", t) if len(t) else []
        if not toks:
            return set()
        gs = (
            [" ".join(toks)]
            if len(toks) < k
            else [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        )
        return {g for g in gs if g.strip()}

    def probes(g):
        mh = hashlib.md5(g.encode()).hexdigest()
        h1, h2 = int(mh[:13], 16), int(mh[13:26], 16)
        return [(h1 + i * h2) % m for i in range(nh)]

    bits = set()
    for d, text in rows[:eval_n]:
        for g in grams(text):
            bits.update(probes(g))
    want = {}
    for d, text in rows[eval_n:]:
        gs = grams(text)
        hits = sum(1 for g in gs if all(p in bits for p in probes(g)))
        want[d] = (len(gs), hits, hits > 0)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in bloom_decontaminate(
            df, eval_n=eval_n, k=k, m_bits=m, n_hash=nh
        ).collect()
    }
    assert got == want


def test_bloom_decontaminate_pandas_transport_matches_literal(spark):
    """The broadcast-numpy mapInPandas probe (the multi-GB-bitmap
    transport) must be bit-identical to the plan-literal JVM probe."""
    import random

    from learnhtml_spark.functions.chunking import bloom_decontaminate

    rng = random.Random(13)
    vocab = ["t%d" % i for i in range(10)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(eval_n=4, k=3, m_bits=2048, n_hash=3)
    lit = sorted(tuple(r) for r in bloom_decontaminate(df, bitmap_mode="literal", **kw).collect())
    pan = sorted(tuple(r) for r in bloom_decontaminate(df, bitmap_mode="pandas", **kw).collect())
    assert lit == pan
    with __import__("pytest").raises(ValueError, match="bitmap_mode"):
        bloom_decontaminate(df, bitmap_mode="nope")


def test_bloom_serving_artifact_equals_inline_build(spark):
    """Offline-fitted bitmap (scripts/fit_bloom.py) served via
    ``bitmap=`` must reproduce the inline eval-build verdicts exactly:
    fit on the eval docs, probe the remaining corpus, compare with the
    self-referential inline mode on the full table."""
    import os
    import random
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from fit_bloom import fit_bloom

    from learnhtml_spark.functions.chunking import bloom_decontaminate

    rng = random.Random(99)
    vocab = ["w%d" % i for i in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 22))))
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eval_n, k, m, nh = 6, 3, 2048, 3

    inline = sorted(
        tuple(r)
        for r in bloom_decontaminate(
            df, eval_n=eval_n, k=k, m_bits=m, n_hash=nh
        ).collect()
    )
    words, _ = fit_bloom([t for _, t in rows[:eval_n]], k, m, nh)
    corpus = spark.createDataFrame(rows[eval_n:], "doc_id long, text string")
    served = sorted(
        tuple(r)
        for r in bloom_decontaminate(
            corpus, k=k, m_bits=m, n_hash=nh, bitmap=words
        ).collect()
    )
    assert served == inline
    with __import__("pytest").raises(ValueError, match="bitmap has"):
        bloom_decontaminate(corpus, m_bits=m, bitmap=words[:-1])


def test_fuzzy_decontaminate_containment_values(spark):
    from learnhtml_spark.functions.chunking import fuzzy_decontaminate

    bench = "a b c d e f g h"          # 4 distinct 5-grams
    rows = [
        (1, bench, "en", "a"),                     # benchmark doc (eval_n=1)
        (2, "a b c d e x y z w", "en", "a"),       # shares 1 of its 5 grams
        (3, bench + " i", "en", "b"),              # shares 4 of its 5 grams
        (4, "totally unrelated words here now", "en", "b"),  # 0 overlap
        (5, "", "en", "b"),                        # gramless: omitted
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["best_eval_id"], r["overlap"],
            r["containment"], r["flagged"],
        )
        for r in fuzzy_decontaminate(df, eval_n=1, k=5, threshold=0.5).collect()
    }
    assert set(got) == {2, 3, 4}
    assert got[2] == (5, 1, 1, 0.2, False)
    assert got[3] == (5, 1, 4, 0.8, True)
    assert got[4] == (1, -1, 0, 0.0, False)  # 5 tokens -> exactly 1 five-gram


def test_fuzzy_decontaminate_best_eval_tiebreak(spark):
    # two eval docs share the same overlap with the probe doc -> the
    # smaller eval_id must win
    from learnhtml_spark.functions.chunking import fuzzy_decontaminate

    rows = [
        (1, "p q r s t", "en", "a"),   # eval 1: one 5-gram
        (2, "p q r s t", "en", "a"),   # eval 2: the same gram
        (3, "p q r s t u v w x", "en", "b"),  # overlaps both equally
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    out = {
        r["doc_id"]: r["best_eval_id"]
        for r in fuzzy_decontaminate(df, eval_n=2, k=5).collect()
    }
    assert out == {3: 1}


def test_mixture_sample_exact_rates_and_slice_consistency(spark):
    """Per-stratum exact floor(n*num/den) counts; a (1,5) stratum is
    row-identical to that stratum's slice of a corpus-wide 1/5
    stratified sample (retunable-rates property); unlisted strata drop;
    num=0 strata contribute nothing."""
    from learnhtml_spark.functions.sampling import mixture_sample, stratified_sample

    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": (1, 5), "s1": (1, 2), "s2": (0, 1)}  # s3 unlisted
    out = {(r["doc_id"], r["source"]) for r in mixture_sample(df, rates).collect()}
    per = {}
    for _, s in out:
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 10, "s1": 25}  # floor(50/5), floor(50/2); s2=0, s3 dropped
    whole = {
        (r["doc_id"], r["source"])
        for r in stratified_sample(df, 1, 5).collect()
        if r["source"] == "s0"
    }
    assert {(d, s) for d, s in out if s == "s0"} == whole
    # deterministic across partitionings
    out2 = {
        (r["doc_id"], r["source"])
        for r in mixture_sample(df.repartition(7), rates).collect()
    }
    assert out == out2


def test_mixture_sample_validates(spark):
    import pytest as _pytest

    from learnhtml_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        mixture_sample(df, {})
    with _pytest.raises(ValueError):
        mixture_sample(df, {"a": (2, 1)})
    with _pytest.raises(ValueError):
        mixture_sample(df, {"a": (1, 0)})
    with _pytest.raises(ValueError):
        mixture_sample(df, {"a": (-1, 2)})


def test_corpus_build_matches_standalone_stages(spark):
    """corpus_build's per-stage flags must equal the standalone
    operators' verdicts row-for-row, and keep must be their
    conjunction, over a corpus that exercises every stage."""
    from pyspark.sql import functions as F

    from learnhtml_spark.functions.chunking import decontaminate
    from learnhtml_spark.functions.dedup import neardup_groups
    from learnhtml_spark.functions.pipeline import corpus_build
    from learnhtml_spark.functions.textstats import quality_gate

    base = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets slowly behind the distant purple mountains tonight ")
    rows = [(i, base + f"unique tail {i} " + " ".join(f"w{i}{j}" for j in range(10)))
            for i in range(12)]
    rows += [(20, rows[5][1]),                  # exact dup of doc 5
             (21, rows[6][1] + " extra"),       # near dup of doc 6
             (22, "tiny"),                      # quality violation
             (23, base * 3)]                    # contaminated-ish vs eval docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus_build(df, eval_n=3).collect()}
    assert set(out) == {r[0] for r in rows if r[0] >= 3}  # eval docs 0,1,2 held out

    nd = {r["doc_id"]: r["is_duplicate"] for r in neardup_groups(df).collect()}
    qg = {r["doc_id"]: r for r in quality_gate(df).collect()}
    dc = {r["doc_id"]: r["contaminated"] for r in decontaminate(df, eval_n=3).collect()}
    fps = df.select("doc_id", F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fp")).collect()
    by_fp = {}
    for r in fps:
        by_fp.setdefault(r["fp"], []).append(r["doc_id"])
    exact_keeper = {d: d == min(by_fp[fp]) for fp, ds in by_fp.items() for d in ds for fp in [fp]}

    for d, r in out.items():
        assert r["is_exact_keeper"] == exact_keeper[d], d
        assert r["is_near_keeper"] == (not nd.get(d, False)), d
        assert r["quality_ok"] == qg[d]["keep"], d
        assert r["first_violation"] == qg[d]["first_violation"], d
        assert r["contaminated"] == dc[d], d
        assert r["keep"] == (r["is_exact_keeper"] and r["is_near_keeper"]
                             and r["quality_ok"] and not r["contaminated"]), d
    assert not out[20]["is_exact_keeper"]   # exact dup dropped
    assert not out[21]["is_near_keeper"]    # near dup dropped
    assert not out[22]["quality_ok"]        # quality violation dropped


def test_contamination_report_hand_checked(spark):
    """Per-eval-doc leak stats: a corpus doc that pastes eval doc 0's
    text shows up against eval item 0 only; clean eval items appear as
    explicit zero rows; with disjoint eval gram sets the report's
    n_gram_hits total equals decontaminate's n_hits total."""
    from learnhtml_spark.functions.chunking import contamination_report, decontaminate

    e0 = "alpha beta gamma delta epsilon zeta eta theta"
    e1 = "one two three four five six seven eight"
    e2 = "red orange yellow green blue indigo violet mauve"
    rows = [
        (0, e0), (1, e1), (2, e2),              # eval suite (3 smallest ids)
        (10, "prefix words then " + e0),        # leaks eval 0
        (11, "totally unrelated corpus content here"),
        (12, e1 + " trailing suffix words"),    # leaks eval 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["eval_doc_id"]: r for r in contamination_report(df, eval_n=3).collect()}
    assert set(out) == {0, 1, 2}
    assert out[2]["n_docs_hit"] == 0 and out[2]["n_gram_hits"] == 0
    assert out[0]["n_docs_hit"] == 1 and out[0]["n_gram_hits"] > 0
    assert out[1]["n_docs_hit"] == 1 and out[1]["n_gram_hits"] > 0
    decon = decontaminate(df, eval_n=3).collect()
    assert sum(r["n_hits"] for r in decon) == sum(
        r["n_gram_hits"] for r in out.values()
    )
    assert {r["doc_id"] for r in decon if r["contaminated"]} == {10, 12}


def test_quantile_filter_matches_naive_window(spark):
    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from learnhtml_spark.functions.windows import quantile_filter

    rows = [(i, f"s{i % 3}", (i * 37) % 500) for i in range(90)] + [
        (1000 + i, "big", (i * 13) % 400) for i in range(300)  # skewed group
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        (r["doc_id"], r["source"], r["n_chars"])
        for r in quantile_filter(df, num=1, den=4).collect()
    }
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    naive = (
        df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("source")))
        .filter(F.col("rk") * 4 <= F.col("n"))
    )
    want = {(r["doc_id"], r["source"], r["n_chars"]) for r in naive.collect()}
    assert got == want
    per = {}
    for _, s, _n in got:
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 7, "s1": 7, "s2": 7, "big": 75}  # floor(30/4), floor(300/4)
    with _pytest.raises(ValueError):
        quantile_filter(df, num=5, den=4)
    # negative metric fails loudly (shared guarded key)
    bad = spark.createDataFrame([(1, "a", -3)], "doc_id long, source string, n_chars long")
    with _pytest.raises(Exception, match="quantile_filter"):
        quantile_filter(bad).collect()
