"""Pure-Python recovering HTML parser producing lxml-shaped element trees.

The reference (nikitautiu/learnhtml) parses documents with lxml/libxml2's
recovering HTML parser (reference: learnhtml/features.py:280,
learnhtml/dataset_conversion/blocks.pyx:853-855).  This module is a
from-scratch reimplementation of that *behavior* — implied html/head/body,
libxml2's start-tag auto-close relation, misplaced html/head/body discarding,
HTML-4 entity handling (semicolon required), script/style CDATA in recovery
mode — so that the kernels in ``learnhtml_spark.kernels`` compute the same
trees, XPaths and text the reference computed.

The auto-close table below was derived *empirically* by probing the system
libxml2 (2.9.x) across all element pairs (see tests/oracle_libxml2.py and
tests/test_htmlparse.py which assert tree equality against that oracle on the
fixture corpus).  Nothing in this file is translated from libxml2 C code.

Designed to run inside Arrow-batched pandas UDFs on executors: no third-party
imports, no recursion (explicit stacks), allocation-light tokenizer.
"""

from __future__ import annotations

import re
from html.entities import name2codepoint

__all__ = [
    "Element",
    "Comment",
    "PI",
    "parse_html",
    "getpath",
    "guess_encoding",
]


class _Sentinel:
    """Mimics lxml's etree.Comment / etree.PI factory sentinels: a node's
    ``tag`` is this object (not a str) for comment/PI nodes."""

    __slots__ = ("_name",)

    def __init__(self, name: str):
        self._name = name

    def __repr__(self):  # pragma: no cover
        return f"<{self._name}>"


Comment = _Sentinel("Comment")
PI = _Sentinel("ProcessingInstruction")


class Element:
    """Minimal lxml-compatible element: tag/attrib/text/tail + tree nav."""

    __slots__ = ("tag", "attrib", "text", "tail", "_children", "_parent", "srcpos")

    def __init__(self, tag, attrib=None, srcpos=-1):
        self.tag = tag
        self.attrib = attrib if attrib is not None else {}
        self.text = None
        self.tail = None
        self._children = []
        self._parent = None
        #: char offset of the start tag in the source document (-1 when the
        #: element is implied); used to map blocks back to input spans
        self.srcpos = srcpos

    # -- tree navigation (lxml surface used by the kernels) ---------------
    def getparent(self):
        return self._parent

    def getchildren(self):
        return list(self._children)

    def __len__(self):
        return len(self._children)

    def __iter__(self):
        return iter(self._children)

    def __getitem__(self, i):
        return self._children[i]

    def index(self, child):
        for i, c in enumerate(self._children):
            if c is child:
                return i
        raise ValueError("child not found")

    def append(self, child):
        child._parent = self
        self._children.append(child)

    def iter(self):
        """Document-order traversal including self, comments and PIs
        (matches lxml's ``root.iter()``)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node._children))

    def itertext(self):
        """All text content of the subtree in document order.  Comment/PI
        *content* is excluded but their tails are included — matching lxml."""
        out = []
        stack = [(self, False)]
        while stack:
            node, emit_tail = stack.pop()
            if emit_tail:
                if node.tail:
                    out.append(node.tail)
                continue
            if isinstance(node.tag, str) and node.text:
                out.append(node.text)
            if node is not self:
                stack.append((node, True))
            for c in reversed(node._children):
                stack.append((c, False))
        return iter(out)

    def __repr__(self):  # pragma: no cover
        t = self.tag if isinstance(self.tag, str) else repr(self.tag)
        return f"<Element {t} at {hex(id(self))}>"


def getpath(node: Element) -> str:
    """lxml-style absolute XPath: '/html/body/div[2]/p'.  The positional
    predicate is included only when the node has same-tag element siblings
    (same rule lxml's ElementTree.getpath applies)."""
    parts = []
    while node is not None:
        parent = node._parent
        tag = node.tag
        if isinstance(tag, str):
            step = tag
            same = [c for c in (parent._children if parent else []) if c.tag == tag]
        elif tag is Comment:
            step = "comment()"
            same = [c for c in (parent._children if parent else []) if c.tag is Comment]
        else:
            step = "processing-instruction()"
            same = [c for c in (parent._children if parent else []) if c.tag is PI]
        if parent is not None and len(same) > 1:
            idx = 1
            for c in same:
                if c is node:
                    break
                idx += 1
            step = f"{step}[{idx}]"
        parts.append(step)
        node = parent
    return "/" + "/".join(reversed(parts))


# ---------------------------------------------------------------------------
# libxml2-compatible grammar tables (derived empirically — see module doc)
# ---------------------------------------------------------------------------

#: void elements: never pushed on the open-element stack (HTML 4 EMPTY set)
VOID_ELEMENTS = frozenset(
    "area base basefont br col frame hr img input isindex link meta param".split()
)

#: head-only elements that imply <head> when seen at top level
_HEAD_CONTENT = frozenset("script style meta link title base".split())

#: elements that do NOT imply <body>
_NO_BODY_IMPLY = frozenset(["noframes", "frame", "frameset"])

#: HTML boolean attributes: a valueless occurrence gets its own name as the
#: value; all other valueless attributes get an empty value
_BOOLEAN_ATTRS = frozenset(
    "checked compact declare defer disabled ismap multiple nohref noresize "
    "noshade nowrap readonly selected".split()
)

#: start tag X pops the current open element while it is in _START_CLOSE[X].
#: Derived by probing libxml2 2.9 pairwise (element universe = HTML4 + common
#: unknowns); the 'head' memberships come from a dedicated head-context probe.
_START_CLOSE = {
    "a": {"a", "head"},
    "abbr": {"head"},
    "acronym": {"head"},
    "address": {"p", "ul", "head"},
    "b": {"head"},
    "bdo": {"head"},
    "big": {"head"},
    "blockquote": {"p", "head"},
    "br": {"head"},
    "caption": {"p"},
    "center": {"b", "font", "i", "p", "head"},
    "cite": {"head"},
    "code": {"head"},
    "col": {"caption", "p"},
    "colgroup": {"caption", "colgroup", "p"},
    "dd": {"address", "dir", "dt", "listing", "menu", "p", "pre", "xmp", "head"},
    "dfn": {"head"},
    "dir": {"p", "head"},
    "div": {"p", "head"},
    "dl": {"address", "dir", "dt", "listing", "menu", "p", "pre", "xmp", "head"},
    "dt": {"address", "dd", "dir", "listing", "menu", "p", "pre", "xmp", "head"},
    "em": {"head"},
    "fieldset": {"a", "h1", "h2", "h3", "h4", "h5", "h6", "legend", "listing",
                 "p", "pre", "xmp", "head"},
    "font": {"head"},
    "form": {"address", "dir", "dl", "form", "h1", "h2", "h3", "h4", "h5", "h6",
             "listing", "menu", "ol", "p", "pre", "ul", "xmp", "head"},
    "frameset": {"p", "head"},
    "h1": {"p", "head"},
    "h2": {"p", "head"},
    "h3": {"p", "head"},
    "h4": {"p", "head"},
    "h5": {"p", "head"},
    "h6": {"p", "head"},
    "hr": {"p", "head"},
    "i": {"head"},
    "iframe": {"head"},
    "img": {"head"},
    "kbd": {"head"},
    "li": {"address", "dl", "h1", "h2", "h3", "h4", "h5", "h6", "li", "listing",
           "p", "pre", "xmp", "head"},
    "listing": {"p", "head"},
    "map": {"head"},
    "menu": {"p", "ul", "head"},
    "ol": {"p", "ul", "head"},
    "optgroup": {"option"},
    "option": {"option"},
    "p": {"b", "big", "h1", "h2", "h3", "h4", "h5", "h6", "i", "p", "s",
          "small", "strike", "tt", "u", "head"},
    "pre": {"p", "ul", "head"},
    "q": {"head"},
    "s": {"head"},
    "samp": {"head"},
    "small": {"head"},
    "span": {"head"},
    "strike": {"head"},
    "strong": {"head"},
    "sub": {"head"},
    "sup": {"head"},
    "table": {"a", "h1", "h2", "h3", "h4", "h5", "h6", "listing", "p", "pre",
              "xmp", "head"},
    "tbody": {"caption", "colgroup", "p", "tbody", "td", "tfoot", "th",
              "thead", "tr"},
    "td": {"a", "b", "font", "i", "p", "span", "td", "th", "u"},
    "tfoot": {"caption", "colgroup", "p", "tbody", "td", "th", "thead", "tr"},
    "th": {"a", "b", "font", "i", "p", "span", "td", "th", "u"},
    "thead": {"caption", "colgroup"},
    "title": {"p"},
    "tr": {"caption", "colgroup", "p", "td", "th", "tr"},
    "tt": {"head"},
    "u": {"head"},
    "ul": {"address", "dir", "listing", "menu", "ol", "p", "pre", "xmp", "head"},
    "var": {"head"},
    "xmp": {"p", "head"},
    # these run their autoclose even when the tag itself is then discarded
    # as misplaced (observed: '0<head>0' closes the implied <p>)
    "head": {"p"},
    "body": {"head", "style", "link", "meta", "script", "title", "p"},
}

_RAWTEXT = frozenset(["script", "style"])

#: end-tag close-through priorities (default 100): an end tag only closes
#: through open elements of lower-or-equal priority.  Values verified by
#: probing libxml2 (b/div/td/tr/tbody/... intermediate-element matrix).
_END_PRIORITY = {
    "div": 150,
    "td": 160,
    "th": 160,
    "tr": 160,
    "tbody": 160,
    "thead": 160,
    "tfoot": 160,
    "table": 170,
    "head": 180,
    "body": 190,
    "html": 200,
}

# entity tables: HTML 4.0 named set (+ XML's apos) — semicolon REQUIRED,
# matching the recovering parser (no-semicolon forms stay literal text)
_ENTITIES = dict(name2codepoint)
_ENTITIES["apos"] = 39

#: characters the recovering parser drops from text content (invalid in
#: HTML: C0 controls except \t \n \r, plus U+FFFE/FFFF and surrogates);
#: attribute values keep them — matching libxml2's reader behavior
_RE_INVALID_TEXT = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f￾￿\ud800-\udfff]"
)

_RE_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9._:-]*")

#: one-shot per-attribute matcher inside a start tag: optional blanks, then
#: either the tag terminator or an attribute (name, optional =value where
#: the value is quoted — possibly unterminated at EOF — or unquoted)
_RE_TAGPART = re.compile(
    r"[ \t\n\r\f\v]*"
    r"(?:(?P<end>/?>)"
    r"|(?P<name>[a-zA-Z_:.][a-zA-Z0-9._:-]*)"
    r"(?:[ \t\n\r\f\v]*=[ \t\n\r\f\v]*"
    r"(?P<val>\"[^\"]*\"|'[^']*'|\"[^\"]*$|'[^']*$|[^ \t\n\r\f\v>]*))?)"
)
# numeric character references: the terminating ';' is OPTIONAL ('&#65'
# decodes to 'A', probed against system libxml2 — htmlParseCharRef stops
# at the first non-digit and eats a directly-following ';'); a bare
# '&#'/'&#x' prefix with no digits is CONSUMED and emits nothing ('&#xZZ'
# -> 'ZZ', a lone '&#' document parses to no tree at all).  Named
# entities still require the ';' (no-semicolon forms stay literal text).
_RE_ENTITY = re.compile(
    r"&(?:([a-zA-Z][a-zA-Z0-9]*);"
    r"|#[xX]([0-9a-fA-F]+);?"
    r"|#([0-9]+);?"
    r"|#[xX]?;?)"
)
_RE_WS_SKIP = re.compile(r"[ \t\n\r\f\v]*")
_RE_DOCTYPE = re.compile(r"<!doctype", re.IGNORECASE)

RE_HTML_ENCODING = re.compile(
    r"<\s*meta[^>]+charset\s*?=\s*?[\'\"]?([^>]*?)[ /;\'\">]", flags=re.IGNORECASE
)
RE_XML_ENCODING = re.compile(
    r"^<\?.*?encoding\s*?=\s*?[\'\"](.*?)[\'\"].*?\?>", flags=re.IGNORECASE
)


def guess_encoding(markup, default: str = "utf-8") -> str:
    """Sniff charset from an XML declaration or an HTML meta tag (same
    heuristics and scan windows as the reference's guess_encoding,
    blocks.pyx:784-802)."""
    if isinstance(markup, bytes):
        text = markup.decode("latin-1")
    else:
        text = markup
    mo = RE_XML_ENCODING.search(text, endpos=1024)
    if mo:
        return mo.group(1)
    moh = RE_HTML_ENCODING.search(text, endpos=max(2048, int(len(text) * 0.05)))
    if moh:
        return moh.group(1)
    return default


def _charref_chr(hexd, dec) -> str:
    cp = int(hexd, 16) if hexd is not None else int(dec)
    if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return ""


def _decode_entities_attr(s: str) -> str:
    """ATTRIBUTE-context decoding: named entities behave exactly as in
    text, but a FAILED numeric ref (no digits after '&#'/'&#x', or a
    codepoint failing libxml2's IS_CHAR test) TRUNCATES the value at the
    reference — probed against system libxml2 ('x&#1;y' -> 'x',
    'x&#zz;y' -> 'x'), whose xmlParseAttValue stops on the error where
    the text path merely skips.  Literal control characters in the
    source are kept (only DECODED ones truncate)."""
    if "&" not in s:
        return s
    out = []
    last = 0
    for m in _RE_ENTITY.finditer(s):
        out.append(s[last : m.start()])
        last = m.end()
        name, hexd, dec = m.groups()
        if name is not None:
            cp = _ENTITIES.get(name)
            out.append(chr(cp) if cp is not None else m.group(0))
            continue
        if hexd is None and dec is None:
            return "".join(out)
        ch = _charref_chr(hexd, dec)
        if ch == "" or _RE_INVALID_TEXT.match(ch):
            return "".join(out)
        out.append(ch)
    out.append(s[last:])
    return "".join(out)


class _TreeBuilder:
    __slots__ = (
        "root",
        "stack",
        "html_state",
        "discard_depth",
        "remove_comments",
        "remove_pis",
        "pos",
        "saw_doctype",
        "left_prolog",
        "head_ever",
        "body_ever",
    )

    def __init__(self, remove_comments: bool, remove_pis: bool):
        self.root = None
        self.stack = []
        self.html_state = 0  # 0=nothing, 3=head seen/implied, 10=body seen/implied
        self.discard_depth = 0
        self.remove_comments = remove_comments
        self.remove_pis = remove_pis
        self.pos = 0  # source char offset of the token being handled
        self.saw_doctype = False
        #: True once any markup token (even a bogus one) was seen — the
        #: prolog's leading-blank skipping stops at that point
        self.left_prolog = False
        # "ever seen" flags gate IMPLIED head/body creation permanently;
        # html_state gates the discard of explicit tags and is re-armed by
        # an explicit </head>/</body>
        self.head_ever = False
        self.body_ever = False

    # -- element plumbing --------------------------------------------------
    def _attach(self, el: Element):
        if self.stack:
            self.stack[-1].append(el)
        elif self.root is not None:
            # content after the root closed re-attaches under the root
            self.root.append(el)
        else:
            self.root = el

    def _push_new(self, tag: str, attrib=None) -> Element:
        el = Element(tag, attrib or {}, srcpos=self.pos)
        self._attach(el)
        self.stack.append(el)
        return el

    # -- libxml2 state machinery -------------------------------------------
    def _auto_close(self, tag: str):
        closes = _START_CLOSE.get(tag)
        if not closes:
            return
        while self.stack and self.stack[-1].tag in closes:
            self.stack.pop()

    def _check_implied(self, tag: str):
        if tag == "html":
            return
        if not self.stack:
            if self.root is None:
                self.root = Element("html")
                self.stack.append(self.root)
            else:
                self._push_new("html")
        if tag in ("body", "head"):
            return
        if len(self.stack) <= 1 and tag in _HEAD_CONTENT:
            if self.head_ever:
                return
            self._push_new("head")
            self.head_ever = True
            self.html_state = 3
        elif tag not in _NO_BODY_IMPLY:
            if self.body_ever:
                return
            for el in self.stack:
                # inside an open head (or body) nothing implies a <body>
                if el.tag in ("body", "head"):
                    return
            self._push_new("body")
            self.body_ever = True
            self.html_state = 10

    def start(self, tag: str, attrib: dict, self_closing: bool):
        # auto-closure runs even for starts that are then discarded as
        # misplaced (a late <head>/<body> still closes an open <p>)
        self._auto_close(tag)

        if not self.stack and self.root is not None and self.saw_doctype:
            # with a DTD present, elements after the root closed are
            # discarded rather than re-opening a container (observed)
            return

        if tag == "html" and self.stack:
            self.discard_depth += 1
            return
        if tag == "head" and self.html_state >= 3:
            self.discard_depth += 1
            return
        if tag == "body" and self.html_state >= 10:
            self.discard_depth += 1
            return

        self._check_implied(tag)

        if tag == "head":
            self.html_state = max(self.html_state, 3)
            self.head_ever = True
        elif tag == "body":
            self.html_state = 10
            self.body_ever = True

        el = Element(tag, attrib, srcpos=self.pos)
        if tag == "html" and self.root is None and not self.stack:
            self.root = el
            self.stack.append(el)
            return
        self._attach(el)
        if tag not in VOID_ELEMENTS and not self_closing:
            self.stack.append(el)

    def end(self, tag: str):
        if tag in ("html", "head", "body") and self.discard_depth > 0:
            self.discard_depth -= 1
            return
        # a misplaced end tag only closes through elements of lower or equal
        # end-priority; hitting a higher-priority open element cancels it
        prio = _END_PRIORITY.get(tag, 100)
        for i in range(len(self.stack) - 1, -1, -1):
            cur = self.stack[i].tag
            if cur == tag:
                del self.stack[i:]
                if tag in ("head", "body"):
                    # an explicitly closed head/body re-arms acceptance of
                    # a later <head>/<body> (observed: spammy multi-body
                    # pages get sibling body elements)
                    self.html_state = 0
                return
            if _END_PRIORITY.get(cur, 100) > prio:
                return
        # unmatched end tag: ignored

    def text(self, s: str, forced: bool = False):
        # ``forced``: the run contains a successfully-decoded char ref, so
        # even an all-whitespace result is CONTENT, never an ignorable
        # blank — libxml2 emits char refs through a SAX characters() call
        # that bypasses the areBlanks() check ('&#9;' alone parses to an
        # implied <p> holding a tab; raw blanks there parse to no tree)
        if not self.stack:
            if not s.strip(" \t\n\r\f\v") and not forced:
                return  # doc-level blank runs are always dropped
            if self.root is not None and self.saw_doctype:
                # with a DTD present, stray doc-level text after the root
                # is discarded (observed libxml2 recovery)
                return
            if self.root is None:
                # implied <p> (libxml2's htmlCheckParagraph with empty stack)
                self._auto_close("p")
                self._check_implied("p")
                self._push_new("p")
            else:
                # after the root closed: re-open an html container (observed
                # libxml2 recovery behavior), then the implied-p rule applies
                self._check_implied("p")
                self._push_new("p")
        else:
            cur = self.stack[-1].tag
            if cur in ("html", "head") and (s.strip(" \t\n\r\f\v") or forced):
                # non-blank text directly in html/head implies a <p>
                self._auto_close("p")
                self._check_implied("p")
                self._push_new("p")
        node = self.stack[-1]
        if node._children:
            last = node._children[-1]
            last.tail = s if last.tail is None else last.tail + s
        else:
            node.text = s if node.text is None else node.text + s

    def raw_text(self, s: str):
        """Error-recovery text (a bogus '<'): appended verbatim at the
        current insertion point with NO implied-element or blank handling
        (libxml2 emits these through a different path than char data)."""
        if self.stack:
            node = self.stack[-1]
        else:
            return  # recovery text with no open element is dropped
        if node._children:
            last = node._children[-1]
            last.tail = s if last.tail is None else last.tail + s
        else:
            node.text = s if node.text is None else node.text + s

    def comment(self, content: str):
        if self.remove_comments or not self.stack:
            return
        el = Element(Comment)
        el.text = content
        self.stack[-1].append(el)

    def pi(self, target: str, content: str):
        if self.remove_pis or not self.stack:
            return
        el = Element(PI)
        el.attrib = {"target": target}
        el.text = content
        self.stack[-1].append(el)


def parse_html(
    html: str,
    remove_comments: bool = False,
    remove_pis: bool = False,
) -> Element | None:
    """Parse an HTML string with libxml2-compatible recovery; returns the
    root element (an implied ``<html>`` when absent) or None for empty
    input.  ``remove_comments/remove_pis`` mirror lxml's HTMLParser flags —
    with removal on, text runs around the removed node merge."""
    b = _TreeBuilder(remove_comments, remove_pis)
    s = html
    n = len(s)
    i = 0
    pending_text = []

    def flush_text():
        if pending_text:
            t = "".join(pending_text)
            if not b.left_prolog and b.root is None and not b.stack:
                # prolog blank-skipping applies to the RAW stream only: an
                # invalid char (later dropped) already ends the skipping
                t = t.lstrip(" \t\n\r\f\v")
            if "&" not in t:
                t = _RE_INVALID_TEXT.sub("", t)
                if t:
                    b.text(t)
            else:
                # Replay libxml2's event stream: char data STOPS at '&' —
                # a run interleaves chardata segments with reference
                # events.  A blank segment followed by a ref ('&', i.e.
                # any non-final segment) fails areBlanks() and is KEPT;
                # only the final segment gets the ignorable-blank
                # treatment.  A ref that decodes to a surviving char is
                # emitted via characters() and is content even when it
                # is whitespace; a failed ref emits nothing.
                last = 0
                for m in _RE_ENTITY.finditer(t):
                    seg = _RE_INVALID_TEXT.sub("", t[last : m.start()])
                    last = m.end()
                    if seg:
                        b.text(seg, forced=True)
                    name, hexd, dec = m.groups()
                    if name is not None:
                        cp = _ENTITIES.get(name)
                        ch = chr(cp) if cp is not None else m.group(0)
                    elif hexd is None and dec is None:
                        ch = ""
                    else:
                        ch = _charref_chr(hexd, dec)
                        if ch and _RE_INVALID_TEXT.match(ch):
                            ch = ""
                    if ch:
                        b.text(ch, forced=True)
                tail_seg = _RE_INVALID_TEXT.sub("", t[last:])
                if tail_seg:
                    b.text(tail_seg)
            pending_text.clear()

    def in_prolog():
        """Before any root/content exists a bogus '<' is dropped entirely
        (libxml2's prolog scanning), not emitted as text."""
        return b.root is None and not any(
            t.strip(" \t\n\r\f\v") for t in pending_text
        )

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            pending_text.append(s[i:])
            break
        if lt > i:
            pending_text.append(s[i:lt])
        i = lt
        b.pos = i
        nxt = s[i + 1] if i + 1 < n else ""

        if nxt == "!":
            if s.startswith("<!--", i):
                end = s.find("-->", i + 4)
                flush_text()
                if end < 0:
                    b.comment(_RE_INVALID_TEXT.sub("", s[i + 4 :]))
                    i = n
                else:
                    b.comment(_RE_INVALID_TEXT.sub("", s[i + 4 : end]))
                    i = end + 3
            elif _RE_DOCTYPE.match(s, i):
                end = s.find(">", i)
                i = n if end < 0 else end + 1
                b.saw_doctype = True
            else:
                # '<!' that is neither comment nor doctype: the '<' is
                # emitted as recovery text (dropped in the prolog); the
                # flush always happens so text runs never span markup
                flush_text()
                if not in_prolog():
                    b.raw_text("<")
                b.left_prolog = True
                i += 1
        elif nxt == "?":
            end = s.find(">", i + 2)
            raw = s[i + 2 :] if end < 0 else s[i + 2 : end]
            m = _RE_NAME.match(raw)
            flush_text()
            if m:
                b.pi(
                    m.group(0),
                    _RE_INVALID_TEXT.sub("", raw[m.end() :].lstrip(" \t\n\r\f\v")),
                )
            i = n if end < 0 else end + 1
        elif nxt == "/":
            m = _RE_NAME.match(s, i + 2)
            if m:
                tag = m.group(0).lower()
                end = s.find(">", m.end())
                flush_text()
                b.left_prolog = True
                b.end(tag)
                i = n if end < 0 else end + 1
            else:
                # '</' followed by a non-name char: exactly the two chars
                # are discarded; the rest (including any '>') stays text
                flush_text()
                i += 2
        elif nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            m = _RE_NAME.match(s, i + 1)
            tag = m.group(0).lower()
            j = m.end()
            attrib = {}
            self_closing = False
            closed = False
            while j < n:
                # one composite match per attribute: leading blanks, tag
                # terminator, or attr name with optional =value
                tm = _RE_TAGPART.match(s, j)
                if tm is None:
                    j = _RE_WS_SKIP.match(s, j).end()
                    if j >= n:
                        break
                    # bogus attribute: skip up to the next blank or tag end,
                    # then continue scanning attributes (libxml2 recovery)
                    while j < n and s[j] not in " \t\n\r\f\v>" and not (
                        s[j] == "/" and j + 1 < n and s[j + 1] == ">"
                    ):
                        j += 1
                    continue
                term = tm.group("end")
                if term is not None:
                    j = tm.end()
                    closed = True
                    self_closing = term == "/>"
                    break
                aname = tm.group("name").lower()
                aval = tm.group("val")
                j = tm.end()
                if aval is None:
                    aval = aname if aname in _BOOLEAN_ATTRS else ""
                else:
                    if aval[:1] in "\"'":
                        q = aval[0]
                        if len(aval) >= 2 and aval[-1] == q:
                            aval = aval[1:-1]
                        else:
                            aval = aval[1:]
                    aval = _decode_entities_attr(aval)
                if aname not in attrib:
                    attrib[aname] = aval
            flush_text()
            b.left_prolog = True
            b.start(tag, attrib, self_closing)
            i = j if closed or j >= n else j
            if tag in _RAWTEXT and not self_closing and b.stack and b.stack[-1].tag == tag:
                # CDATA mode (script/style), recovery semantics observed
                # from libxml2:
                # - end tags at the very START of the content are dispatched
                #   normally (an unmatched one is swallowed);
                # - during CDATA consumption only an end tag whose name
                #   PREFIX-matches the raw tag breaks; a prefix-but-not-exact
                #   match (</scriptx>) is dispatched (usually a no-op) and
                #   CDATA consumption resumes;
                # - everything else, including other end tags, stays text.
                el = b.stack[-1]
                pos = j
                if tag == "script" and s[pos : pos + 9].lower() == "<noscript":
                    # observed libxml2 special case: a <noscript> start tag
                    # at the very beginning of script content closes the
                    # script and is parsed as a normal element
                    b.end("script")
                    i = pos
                    continue
                while pos < n and s.startswith("</", pos):
                    m2 = _RE_NAME.match(s, pos + 2)
                    if not m2:
                        # '</' + non-name at content start: the two chars
                        # are dropped, the rest is CDATA text
                        pos += 2
                        break
                    gt = s.find(">", m2.end())
                    b.end(m2.group(0).lower())
                    pos = n if gt < 0 else gt + 1
                    if not (b.stack and b.stack[-1] is el):
                        break
                parts = []

                def _flush_raw():
                    txt = _RE_INVALID_TEXT.sub("", "".join(parts))
                    parts.clear()
                    if txt:
                        el.text = txt if el.text is None else el.text + txt

                while b.stack and b.stack[-1] is el and pos < n:
                    k = s.find("</", pos)
                    if k < 0:
                        parts.append(s[pos:])
                        pos = n
                        break
                    if s[k + 2 : k + 2 + len(tag)].lower() == tag:
                        parts.append(s[pos:k])
                        m3 = _RE_NAME.match(s, k + 2)
                        gt = s.find(">", m3.end())
                        _flush_raw()
                        b.end(m3.group(0).lower())
                        pos = n if gt < 0 else gt + 1
                    else:
                        parts.append(s[pos : k + 2])
                        pos = k + 2
                _flush_raw()
                i = pos
        else:
            flush_text()
            if not in_prolog():
                b.raw_text("<")
            b.left_prolog = True
            i += 1

    flush_text()
    return b.root
