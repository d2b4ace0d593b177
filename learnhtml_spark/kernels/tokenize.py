"""Tokenizers and text sanitizers with reference-exact semantics.

Parity notes (behavior contracts, not code, from the reference):
- ``simple_tokenizer``: split on ``[\\W_]+`` (unicode), lowercase, drop
  empties — blocks.pyx:41-47.
- ``tokens_from_text``: ASCII-whitespace-only splitter (space \\t \\n \\r
  \\f \\v), applied per text fragment — blocks.pyx:107-134.  NB: this is NOT
  ``str.split()`` — Python's default split also breaks on unicode spaces
  (U+00A0 etc.) which the reference's byte-level scanner does not.
- ``collapse_whitespace`` / ``get_blocks``: gold-standard sanitizers —
  conversion.py:32-53.
"""

from __future__ import annotations

import re

RE_TEXT = re.compile(r"[^\W_]+", flags=re.UNICODE)
_RE_TOKENIZER = re.compile(r"[\W_]+", re.UNICODE)
_RE_ASCII_WS = re.compile(r"[ \t\n\r\f\v]+")


def simple_tokenizer(text: str) -> list[str]:
    """Unicode word tokenizer: split on non-word runs, lowercase, non-empty."""
    return [t.lower() for t in _RE_TOKENIZER.split(text) if t]


def word_split_with_empties(text: str) -> list[str]:
    """``re.split('[\\W_]+', text)`` INCLUDING boundary empties — the link
    and text density denominators count these empties (blocks.pyx:439-450)."""
    return _RE_TOKENIZER.split(text)


def tokens_from_text(fragments) -> list[str]:
    """ASCII-whitespace tokenization applied per fragment; fragments never
    merge across boundaries (each is tokenized independently)."""
    out = []
    for frag in fragments:
        for tok in _RE_ASCII_WS.split(frag):
            if tok:
                out.append(tok)
    return out


def collapse_whitespace(strarg: str, remove_nl: bool = False) -> str:
    """Gold-standard text cleanup: tabs→space, optional newline removal,
    ``<tag>`` markers→newline, collapse runs of spaces."""
    strarg = re.sub(r"\t+", " ", strarg)
    if remove_nl:
        strarg = re.sub(r"\n", " ", strarg)
    strarg = re.sub(r"<[a-zA-Z]+>", "\n", strarg)
    strarg = re.sub(r" +", " ", strarg)
    return strarg


def get_blocks(strarg: str, cleaneval: bool = False) -> list[str]:
    """Sanitize gold-standard text into its list of non-empty blocks."""
    sanitized = collapse_whitespace(strarg, remove_nl=cleaneval)
    return [b for b in (blk.strip() for blk in sanitized.split("\n")) if b]
