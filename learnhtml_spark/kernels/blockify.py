"""Blockifier: segment a DOM tree into ordered text blocks.

From-scratch reimplementation of the reference blockifier's *semantics*
(learnhtml/dataset_conversion/blocks.pyx, itself following Kohlschütter
et al., WSDM 2010).  Behavior contracts replicated exactly:

- BLACKLIST tags are skipped entirely except their tail text
  (blocks.pyx:64-74,629-633).
- BLOCKS tags (h1-h6, p, div, table, map) cut a new block
  (blocks.pyx:77-78,635-646).
- ``<a>`` subtrees contribute to both block text and link tokens and are
  not recursed as structure (blocks.pyx:648-651,491-521).
- Only *element* children are traversed (the reference iterates with
  lxml's nextElement which skips comments/PIs), so text following a
  comment node is not collected — a quirk the labeling goldens depend on.
- Per-block stats: link/text density with empty-token-counting
  denominators (blocks.pyx:438-450), css id/class accumulation
  (blocks.pyx:370-394,452-459), tag-count features (blocks.pyx:700-781).
- Blocks with no ASCII-whitespace tokens are dropped at creation; the
  public ``blockify`` additionally drops blocks with no word characters
  (blocks.pyx:868).

Implementation is an explicit-stack DFS (never Python recursion — giant
pages at 100 TB scale exceed any recursion limit) over
``learnhtml_spark.htmlparse.Element`` trees.
"""

from __future__ import annotations

import math

from learnhtml_spark.htmlparse import Element, parse_html
from learnhtml_spark.kernels.tokenize import (
    RE_TEXT,
    tokens_from_text,
    word_split_with_empties,
)

BLACKLIST = frozenset(
    """applet area base basefont bdo button caption fieldset fram frameset
    iframe img input legend link menu meta noframes noscript object optgroup
    option param script select style textarea var xmp like like-box plusone
    svg math""".split()
)

BLOCKS = frozenset("h1 h2 h3 h4 h5 h6 p div table map".split())

_CSS_ATTRS = ("id", "class")


class Block:
    """One extracted text block (ordered, document order)."""

    __slots__ = (
        "text",
        "link_density",
        "text_density",
        "link_tokens",
        "css",
        "features",
    )

    def __init__(self, text, link_density, text_density, link_tokens, css, features):
        self.text = text
        self.link_density = link_density
        self.text_density = text_density
        self.link_tokens = link_tokens
        self.css = css
        self.features = features

    def __repr__(self):  # pragma: no cover
        return f"<Block {self.text[:40]!r}>"


class BlockifyError(Exception):
    """Raised when a document cannot be parsed into a tree."""


def _element_children(node: Element):
    return [c for c in node._children if isinstance(c.tag, str)]


class _State:
    """Mutable per-document accumulation state (one partial block)."""

    __slots__ = (
        "do_css",
        "text",
        "link_tokens",
        "css",
        "block_start_tag",
        "block_start_element",
        "results",
        # tag-count feature state
        "tc",
        "ac",
        "tc_lb",
        "current_depth",
        "min_depth_last_block",
        "min_depth_last_block_pending",
    )

    def __init__(self, do_css: bool):
        self.do_css = do_css
        self.text = []
        self.link_tokens = []
        self.css = {a: [] for a in _CSS_ATTRS}
        self.block_start_tag = ""
        self.block_start_element = None
        self.results = []
        self.tc = 1  # counts the top-level tag
        self.ac = 0
        self.tc_lb = 0
        self.current_depth = 0
        self.min_depth_last_block = 0
        self.min_depth_last_block_pending = 0

    # --- feature-extractor hooks (tag-count accumulator) ------------------
    def on_tag(self, tag: str):
        self.tc += 1
        if tag == "a":
            self.ac += 1
        if tag not in BLOCKS:
            self.min_depth_last_block = self.min_depth_last_block_pending

    def on_subtree(self, start_or_end: int):
        self.current_depth += start_or_end
        if self.current_depth < self.min_depth_last_block_pending:
            self.min_depth_last_block_pending = self.current_depth

    def add_text(self, s):
        if s:
            self.text.append(s)

    def update_css(self, node: Element):
        if self.do_css:
            attrib = node.attrib
            for a in _CSS_ATTRS:
                v = attrib.get(a)
                if v is not None:
                    self.css[a].append(v)

    def flush(self):
        """Create a block from the accumulated state (if it has tokens),
        append to results, reset the partial state."""
        block_tokens = tokens_from_text(self.text)
        if block_tokens:
            block_text = " ".join(block_tokens)
            link_text = " ".join(self.link_tokens)
            at = word_split_with_empties(link_text)
            bt = word_split_with_empties(block_text)
            link_d = float(len(at)) / len(bt)
            lines = int(math.ceil(len(block_text) / 80.0))
            if lines == 1:
                text_d = float(len(bt))
            else:
                toks = word_split_with_empties(block_text[: (lines - 1) * 80])
                text_d = len(toks) / (lines - 1.0)
            css = {}
            if self.do_css:
                for a in _CSS_ATTRS:
                    css[a] = " ".join(tokens_from_text(self.css[a])).lower()
            features = {
                "tagcount_since_last_block": self.tc_lb,
                "tagcount": self.tc - 1,
                "anchor_count": self.ac,
                "min_depth_since_last_block": self.min_depth_last_block,
                "block_start_tag": self.block_start_tag,
                "block_start_element": self.block_start_element,
            }
            self.tc_lb = 0
            self.tc = 1
            self.ac = 0
            self.min_depth_last_block_pending = self.current_depth
            self.min_depth_last_block = self.current_depth
            self.results.append(
                Block(block_text, link_d, text_d, list(self.link_tokens), css, features)
            )
        else:
            # empty block: accumulate its tag count into "since last block"
            self.tc_lb += self.tc - 1
            self.tc = 1
            self.ac = 0
        self.text = []
        self.link_tokens = []
        if self.do_css:
            self.css = {a: [] for a in _CSS_ATTRS}


def _anchor_text_ordered(state: _State, anchor: Element) -> list[str]:
    """Order-exact anchor subtree text: [text, child-subtrees..., tails]."""
    pieces = []

    def visit(el: Element, tail: bool):
        # iterative: stack of (element, phase) — phase 0 = enter, 1 = tail
        stack = [(el, 1 if tail else 2), (el, 0)]
        while stack:
            node, phase = stack.pop()
            if phase == 0:
                if node.text:
                    pieces.append(node.text)
                kids = _element_children(node)
                for c in reversed(kids):
                    stack.append((c, 3))  # child dispatch
            elif phase == 1:
                if node.tail:
                    pieces.append(node.tail)
            elif phase == 3:
                state.on_tag(node.tag)
                if node.tag in BLACKLIST:
                    if node.tail:
                        pieces.append(node.tail)
                else:
                    stack.append((node, 1))
                    stack.append((node, 0))

    visit(anchor, False)
    return pieces


def blocks_from_tree(root: Element, do_css: bool = True) -> list[Block]:
    """Segment a parsed tree into blocks (document order).  The final
    partial block is flushed at the end; token-less blocks are dropped."""
    state = _State(do_css)
    if root is None:
        return []

    # explicit-stack rendition of the recursive traversal
    ENTER, CHILD, EXIT = 0, 1, 2
    stack = [(root, EXIT, None), (root, ENTER, None)]
    while stack:
        node, phase, it = stack.pop()
        if phase == ENTER:
            # css_tree bookkeeping is write-only in the reference (the block
            # css output reads only the block-local accumulation), so the
            # tree push/pop is intentionally not modeled.
            state.on_subtree(1)
            if state.block_start_element is None:
                state.block_start_element = node
            stack.append((node, CHILD, iter(_element_children(node))))
        elif phase == CHILD:
            child = next(it, None)
            if child is None:
                continue
            stack.append((node, CHILD, it))
            tag = child.tag
            state.on_tag(tag)
            if tag in BLACKLIST:
                state.add_text(child.tail)
            elif tag in BLOCKS:
                state.flush()
                state.block_start_tag = tag
                state.block_start_element = child
                state.add_text(child.text)
                state.update_css(child)
                # recurse into child, then add its tail
                stack.append((child, EXIT, None))
                stack.append((child, ENTER, None))
            elif tag == "a":
                pieces = _anchor_text_ordered(state, child)
                state.text.extend(pieces)
                if child.tail:
                    state.text.append(child.tail)
                state.link_tokens.extend(tokens_from_text(pieces))
                state.update_css(child)
            else:
                state.add_text(child.text)
                state.update_css(child)
                stack.append((child, EXIT, None))
                stack.append((child, ENTER, None))
        else:  # EXIT
            state.on_subtree(-1)
            # tail of the recursed element is added by its parent frame
            if node is not root:
                state.add_text(node.tail)

    state.flush()
    return state.results


def blockify(html: str, do_css: bool = True) -> list[Block]:
    """Parse + blockify + drop blocks without word characters (the public
    blockifier surface; comments/PIs removed at parse like the reference's
    standalone parser configuration)."""
    root = parse_html(html, remove_comments=True, remove_pis=True)
    if root is None:
        raise BlockifyError("unparseable document")
    return [b for b in blocks_from_tree(root, do_css) if RE_TEXT.search(b.text)]
