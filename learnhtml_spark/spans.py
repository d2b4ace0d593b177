"""Interleaved-span document model (BASELINE.json input_hint).

A document row is ``(doc_id, spans)`` where spans is the offset-ordered
array of ``(kind, text, media_ref, offset)``:

- ``kind='html'`` spans carry markup fragments whose concatenation in
  offset order is the page markup (the reference's ``html`` column);
- ``kind='media'`` spans carry opaque media pointers (the reference's
  blockifier blacklists embed tags like ``img``, blocks.pyx:64-74; here
  media survive as first-class spans and are carried through to the
  output sequence in order).

``assemble_output`` merges extracted content blocks with carried-through
media spans: each block is anchored to the input html span in which its
start element's source position falls, and media spans sort between
blocks by input offset.
"""

from __future__ import annotations

from bisect import bisect_right


def html_from_spans(spans) -> tuple[str, list[tuple[int, int]]]:
    """Concatenate html-kind span texts in offset order.

    Returns (html, boundaries) where boundaries is a list of
    (char_start, input_offset) per html span, for mapping parse positions
    back to input offsets.
    """
    parts = []
    boundaries = []
    pos = 0
    for sp in sorted(spans, key=lambda s: s["offset"]):
        if sp["kind"] == "media":
            continue
        text = sp["text"] or ""
        boundaries.append((pos, sp["offset"]))
        parts.append(text)
        pos += len(text)
    return "".join(parts), boundaries


def media_spans(spans) -> list[dict]:
    return sorted(
        (s for s in spans if s["kind"] == "media"), key=lambda s: s["offset"]
    )


def block_input_offset(srcpos: int, boundaries) -> int:
    """Input-span offset containing source char position ``srcpos``."""
    if not boundaries:
        return 0
    # rightmost html span whose char_start <= srcpos
    idx = bisect_right(boundaries, (max(srcpos, 0), float("inf"))) - 1
    if idx < 0:
        idx = 0
    return boundaries[idx][1]


def assemble_output(doc_id, content_blocks, boundaries, media):
    """Ordered output rows (doc_id, kind, text, media_ref, offset).

    ``content_blocks`` are (block_text, srcpos) in document order;
    ``media`` are input media spans (sorted by input offset).  A media span
    with input offset m precedes the first block whose anchoring input
    offset is > m; ties (media inside the same anchor region) keep media
    after the block, preserving the reading order of the original page.
    """
    anchored = [
        (block_input_offset(srcpos, boundaries), text)
        for text, srcpos in content_blocks
    ]
    rows = []
    mi = 0
    out_off = 0
    for anchor, text in anchored:
        while mi < len(media) and media[mi]["offset"] < anchor:
            m = media[mi]
            rows.append((doc_id, "media", m["text"] or "", m["media_ref"], out_off))
            out_off += 1
            mi += 1
        rows.append((doc_id, "text", text, None, out_off))
        out_off += 1
    for m in media[mi:]:
        rows.append((doc_id, "media", m["text"] or "", m["media_ref"], out_off))
        out_off += 1
    return rows


def split_html_to_spans(html: str, n_chunks: int = 4, media_refs=()) -> list[dict]:
    """Deterministically split page markup into n interleaved html spans
    (+ optional media spans) — fixture/synthetic corpus generator helper.
    Concatenation of the html spans in offset order restores the exact
    markup regardless of split points."""
    n_chunks = max(1, min(n_chunks, len(html) or 1))
    step = (len(html) + n_chunks - 1) // n_chunks if html else 1
    spans = []
    offset = 0
    for i in range(0, max(len(html), 1), step):
        spans.append(
            {
                "kind": "html",
                "text": html[i : i + step],
                "media_ref": None,
                "offset": offset,
            }
        )
        offset += 1
        if media_refs and (offset // 2 - 1) < len(media_refs) and offset % 2 == 0:
            ref = media_refs[offset // 2 - 1]
            spans.append(
                {"kind": "media", "text": "", "media_ref": ref, "offset": offset}
            )
            offset += 1
    return spans
