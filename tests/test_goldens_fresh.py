"""Guard: the committed golden parquets (learnhtml_spark/artifacts/goldens/,
the DuckDB oracles for the three DOM queries) must match a fresh local
kernel run.  If corpus.py or any kernel changes semantics, this fails
BEFORE the driver's oracle gate does — regenerate with
`python scripts/make_goldens.py`."""

import os

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "learnhtml_spark", "artifacts", "goldens")
N_DOCS = 8


def _sample_docs():
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    return docs.head(N_DOCS)


def test_spans_golden_fresh():
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_goldens import row_key

    from learnhtml_spark.corpus import expected_extraction

    docs = _sample_docs()
    fresh = expected_extraction(docs)
    gold = pd.read_parquet(os.path.join(GOLD, "spans.parquet"))
    keys = {
        row_key(d, l, s, t)
        for d, t, l, s in zip(docs["doc_id"], docs["text"], docs["lang"], docs["source"])
    }
    got = gold[gold["row_key"].isin(keys)]
    assert len(got) == len(fresh)
    want = {tuple(r) for r in fresh}
    have = {
        (r.doc_id, r.kind, r.text, r.media_ref if pd.notna(r.media_ref) else None, r.offset)
        for r in got.itertuples()
    }
    assert want == have


def test_labels_golden_fresh():
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_goldens import row_key

    from learnhtml_spark.corpus import synthesize_page
    from learnhtml_spark.kernels.labeling import get_ratios_per_html
    from learnhtml_spark.spans import html_from_spans

    docs = _sample_docs()
    gold = pd.read_parquet(os.path.join(GOLD, "labels.parquet"))
    for d, t, l, s in zip(docs["doc_id"], docs["text"], docs["lang"], docs["source"]):
        key = row_key(d, l, s, t)
        spans, expected = synthesize_page(str(d), t, s, l)
        html, _ = html_from_spans(spans)
        fresh = {p: r for p, r, _ in get_ratios_per_html(html, expected)}
        g = gold[gold["row_key"] == key].set_index("node_path")
        assert len(g) == len(fresh)
        for p, r in fresh.items():
            assert abs(g.loc[p, "ratio"] - r) < 1e-12
