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

    __slots__ = (
        "tag", "attrib", "text", "tail", "_children", "_parent", "srcpos",
        "_path",
    )

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
        #: memoized getpath() result (trees are read-only once parsed; the
        #: serving path asks for block paths twice per node — see getpath)
        self._path = None

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
    (same rule lxml's ElementTree.getpath applies).

    Memoized on the element (``_path`` slot): trees are read-only once the
    parser returns, and the serving path requests each block-start node's
    path twice (block mapping + feature frame) while siblings share every
    ancestor prefix — the cache turns the O(depth × siblings) walk per
    call into amortized O(own siblings).  Callers that mutate a tree
    AFTER asking for paths would see stale positional predicates; nothing
    in the repo does (parse → read only)."""
    anc = []
    top = node
    while top is not None and top._path is None:
        anc.append(top)
        top = top._parent
    prefix = top._path if top is not None else ""
    for node in reversed(anc):
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
        prefix = f"{prefix}/{step}"
        node._path = prefix
    return prefix


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
    "frameset": {"p", "title", "head"},
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
    "tr": 163,
    "tbody": 168,
    "thead": 168,
    "tfoot": 168,
    "table": 170,
    "head": 180,
    # body blocks like head (probed: '<head><noframes><body></head>' pops
    # the whole chain — a 190 here wrongly blocked the </head>)
    "body": 180,
    "html": 200,
}

#: BLOCKING priority: an end tag is ignored when an open element ABOVE its
#: match out-blocks it; default blocking power = the element's own
#: _END_PRIORITY.  Fitted empirically (full shielded end×intermediate
#: matrix vs libxml2): tr and the row groups block the 160 tier AND each
#: level below ('<tr><thead></tr>' leaves the stack untouched,
#: '<th><div><tbody></th>' is ignored), but row-group END tags close
#: through the whole tier ('<tbody><thead></tbody>'-style closes, hence
#: their 168 end power above the 165 block), and </table> at 170 closes
#: through everything ('<table><thead></table>' closes).
_END_BLOCK = {
    "tr": 165,
    "tbody": 165,
    "thead": 165,
    "tfoot": 165,
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

#: END-tag names additionally START with '.', '_' or ':' (probed:
#: '</.x>' is a consumed end tag while '</-' and '</9' are bogus text)
_RE_ENDNAME = re.compile(r"[a-zA-Z_:.][a-zA-Z0-9._:-]*")

def _decode_ranges(spec: str):
    out = []
    for part in spec.replace("\n", "").split(","):
        a, _, b = part.partition("-")
        lo = int(a, 16)
        out.append((lo, int(b, 16) if b else lo))
    return out


#: XML 1.0 Letter / NameChar sets for the non-ASCII BMP, derived
#: EMPIRICALLY by probing the system libxml2 over every BMP codepoint
#: (scripts in the session log; 203 + 282 ranges — the spec's Appendix-B
#: productions, which differ from modern Unicode isalpha(): U+02A9 is a
#: letter today but not a BaseChar).  Astral-plane chars are not name
#: chars (probed).  Used for PI target names.
_PI_START_RANGES = _decode_ranges("""c0-d6,d8-f6,f8-131,134-13e,141-148,14a-17e,180-1c3,1cd-1f0,1f4-1f5,1fa-
217,250-2a8,2bb-2c1,386,388-38a,38c,38e-3a1,3a3-3ce,3d0-
3d6,3da,3dc,3de,3e0,3e2-3f3,401-40c,40e-44f,451-45c,45e-481,490-4c4,4c7-
4c8,4cb-4cc,4d0-4eb,4ee-4f5,4f8-4f9,531-556,559,561-586,5d0-5ea,5f0-5f2,621-
63a,641-64a,671-6b7,6ba-6be,6c0-6ce,6d0-6d3,6d5,6e5-6e6,905-939,93d,958-
961,985-98c,98f-990,993-9a8,9aa-9b0,9b2,9b6-9b9,9dc-9dd,9df-9e1,9f0-9f1,a05-
a0a,a0f-a10,a13-a28,a2a-a30,a32-a33,a35-a36,a38-a39,a59-a5c,a5e,a72-a74,a85-
a8b,a8d,a8f-a91,a93-aa8,aaa-ab0,ab2-ab3,ab5-ab9,abd,ae0,b05-b0c,b0f-b10,b13-
b28,b2a-b30,b32-b33,b36-b39,b3d,b5c-b5d,b5f-b61,b85-b8a,b8e-b90,b92-b95,b99-
b9a,b9c,b9e-b9f,ba3-ba4,ba8-baa,bae-bb5,bb7-bb9,c05-c0c,c0e-c10,c12-c28,c2a-
c33,c35-c39,c60-c61,c85-c8c,c8e-c90,c92-ca8,caa-cb3,cb5-cb9,cde,ce0-ce1,d05-
d0c,d0e-d10,d12-d28,d2a-d39,d60-d61,e01-e2e,e30,e32-e33,e40-e45,e81-
e82,e84,e87-e88,e8a,e8d,e94-e97,e99-e9f,ea1-ea3,ea5,ea7,eaa-eab,ead-eae,eb0,
eb2-eb3,ebd,ec0-ec4,f40-f47,f49-f69,10a0-10c5,10d0-10f6,1100,1102-1103,1105-
1107,1109,110b-110c,110e-1112,113c,113e,1140,114c,114e,1150,1154-
1155,1159,115f-1161,1163,1165,1167,1169,116d-116e,1172-
1173,1175,119e,11a8,11ab,11ae-11af,11b7-11b8,11ba,11bc-
11c2,11eb,11f0,11f9,1e00-1e9b,1ea0-1ef9,1f00-1f15,1f18-1f1d,1f20-1f45,1f48-
1f4d,1f50-1f57,1f59,1f5b,1f5d,1f5f-1f7d,1f80-1fb4,1fb6-1fbc,1fbe,1fc2-
1fc4,1fc6-1fcc,1fd0-1fd3,1fd6-1fdb,1fe0-1fec,1ff2-1ff4,1ff6-1ffc,2126,212a-
212b,212e,2180-2182,3007,3021-3029,3041-3094,30a1-30fa,3105-312c,4e00-
9fa5,ac00-d7a3,fffe-ffff""")
_PI_CONT_RANGES = _decode_ranges("""b7,c0-d6,d8-f6,f8-131,134-13e,141-148,14a-17e,180-1c3,1cd-1f0,1f4-1f5,1fa-
217,250-2a8,2bb-2c1,2d0-2d1,300-345,360-361,386-38a,38c,38e-3a1,3a3-3ce,3d0-
3d6,3da,3dc,3de,3e0,3e2-3f3,401-40c,40e-44f,451-45c,45e-481,483-486,490-
4c4,4c7-4c8,4cb-4cc,4d0-4eb,4ee-4f5,4f8-4f9,531-556,559,561-586,591-5a1,5a3-
5b9,5bb-5bd,5bf,5c1-5c2,5c4,5d0-5ea,5f0-5f2,621-63a,640-652,660-669,670-
6b7,6ba-6be,6c0-6ce,6d0-6d3,6d5-6e8,6ea-6ed,6f0-6f9,901-903,905-939,93c-
94d,951-954,958-963,966-96f,981-983,985-98c,98f-990,993-9a8,9aa-9b0,9b2,9b6-
9b9,9bc,9be-9c4,9c7-9c8,9cb-9cd,9d7,9dc-9dd,9df-9e3,9e6-9f1,a02,a05-a0a,a0f-
a10,a13-a28,a2a-a30,a32-a33,a35-a36,a38-a39,a3c,a3e-a42,a47-a48,a4b-a4d,a59-
a5c,a5e,a66-a74,a81-a83,a85-a8b,a8d,a8f-a91,a93-aa8,aaa-
ab0,ab2-ab3,ab5-ab9,abc-ac5,ac7-ac9,acb-acd,ae0,ae6-aef,b01-b03,b05-b0c,b0f-
b10,b13-b28,b2a-b30,b32-b33,b36-b39,b3c-b43,b47-b48,b4b-b4d,b56-b57,b5c-
b5d,b5f-b61,b66-b6f,b82-b83,b85-b8a,b8e-b90,b92-b95,b99-b9a,b9c,b9e-b9f,ba3-
ba4,ba8-baa,bae-bb5,bb7-bb9,bbe-bc2,bc6-bc8,bca-bcd,bd7,be7-bef,c01-c03,c05-
c0c,c0e-c10,c12-c28,c2a-c33,c35-c39,c3e-c44,c46-c48,c4a-c4d,c55-c56,c60-
c61,c66-c6f,c82-c83,c85-c8c,c8e-c90,c92-ca8,caa-cb3,cb5-cb9,cbe-
cc4,cc6-cc8,cca-ccd,cd5-cd6,cde,ce0-ce1,ce6-cef,d02-d03,d05-d0c,d0e-d10,d12-
d28,d2a-d39,d3e-d43,d46-d48,d4a-d4d,d57,d60-d61,d66-d6f,e01-e2e,e30-e3a,e40-
e4e,e50-e59,e81-e82,e84,e87-e88,e8a,e8d,e94-e97,e99-e9f,ea1-ea3,ea5,ea7,eaa-
eab,ead-eae,eb0-eb9,ebb-ebd,ec0-ec4,ec6,ec8-ecd,ed0-ed9,f18-f19,f20-
f29,f35,f37,f39,f3e-f47,f49-f69,f71-f84,f86-f8b,f90-f95,f97,f99-fad,fb1-
fb7,fb9,10a0-10c5,10d0-10f6,1100,1102-1103,1105-1107,1109,110b-110c,110e-
1112,113c,113e,1140,114c,114e,1150,1154-1155,1159,115f-
1161,1163,1165,1167,1169,116d-116e,1172-1173,1175,119e,11a8,11ab,11ae-
11af,11b7-11b8,11ba,11bc-11c2,11eb,11f0,11f9,1e00-1e9b,1ea0-1ef9,1f00-
1f15,1f18-1f1d,1f20-1f45,1f48-1f4d,1f50-1f57,1f59,1f5b,1f5d,1f5f-1f7d,1f80-
1fb4,1fb6-1fbc,1fbe,1fc2-1fc4,1fc6-1fcc,1fd0-1fd3,1fd6-1fdb,1fe0-1fec,1ff2-
1ff4,1ff6-1ffc,20d0-20dc,20e1,2126,212a-212b,212e,2180-2182,3005,3007,3021-
302f,3031-3035,3041-3094,3099-309a,309d-309e,30a1-30fa,30fc-30fe,3105-
312c,4e00-9fa5,ac00-d7a3""")


def _in_ranges(cp: int, ranges) -> bool:
    from bisect import bisect_right

    i = bisect_right(ranges, (cp, 0x10FFFF)) - 1
    return i >= 0 and ranges[i][0] <= cp <= ranges[i][1]


def _pi_name(s: str, pos: int) -> str | None:
    """PI target name per libxml2: starts with an ASCII letter or an XML
    1.0 BaseChar/Ideographic ('<?\xc0?>' is a PI, '<?\x80'/'<?\xbe'
    are bogus); continues with XML NameChars or ._:-.  '_' and ':'
    START a target per XML NameStartChar; '.', '-' and digits do not
    (probed: '<?:?>' and '<?_?>' are consumed, '<?.?>' stays text)."""
    if pos >= len(s):
        return None
    c = s[pos]
    o = ord(c)
    if not (
        ("a" <= c <= "z")
        or ("A" <= c <= "Z")
        or c in "_:"
        or (o > 127 and _in_ranges(o, _PI_START_RANGES))
    ):
        return None
    j = pos + 1
    while j < len(s):
        c = s[j]
        o = ord(c)
        if (
            ("a" <= c <= "z")
            or ("A" <= c <= "Z")
            or ("0" <= c <= "9")
            or c in "._:-"
            or (o > 127 and _in_ranges(o, _PI_CONT_RANGES))
        ):
            j += 1
        else:
            break
    return s[pos:j]

#: one-shot per-attribute matcher inside a start tag: optional blanks, then
#: either the tag terminator or an attribute (name, optional =value where
#: the value is quoted — possibly unterminated at EOF — or unquoted)
# in-tag blanks are space/tab/cr/lf ONLY (libxml2 IS_BLANK): \f/\v are
# ordinary junk chars — they TERMINATE names (then get skipped as a bogus
# attribute) but are legal INSIDE unquoted values ('a=b\x0cc' -> 'b\x0cc',
# probed)
_RE_TAGPART = re.compile(
    r"[ \t\n\r]*"
    r"(?:(?P<end>/?>)"
    r"|(?P<name>[a-zA-Z_:.][a-zA-Z0-9._:-]*)"
    r"(?:[ \t\n\r]*=[ \t\n\r]*"
    r"(?P<val>\"[^\"]*\"|'[^']*'|\"[^\"]*$|'[^']*$|[^ \t\n\r>]*))?)"
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
_RE_WS_SKIP = re.compile(r"[ \t\n\r]*")
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
        "saw_misc",
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
        self.saw_misc = False
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
            # implied head also stays suppressed once BODY content has
            # been seen document-wide ('x</html><title>' nests the title
            # directly under the re-opened html — probed libxml2)
            if self.head_ever or self.body_ever:
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

        if not self.stack and self.root is not None and (
            self.saw_doctype or self.saw_misc
        ):
            # with a DTD or any prolog-level comment/PI present, elements
            # after the root closed are discarded rather than re-opening
            # a container (observed)
            return
        if not self.stack and self.root is not None:
            # the root has closed: this element re-opens a NESTED <html>
            # container (via _check_implied) that re-accepts EXPLICIT
            # <head>/<body> ('<head></html><head>' nests a second head)
            # — but head_ever/body_ever are INHERITED, so IMPLIED
            # head/body stay suppressed ('<head></html><meta>' puts the
            # meta directly under the nested html; '<body>y</html>x'
            # gets a bare implied <p>) — probed libxml2
            self.html_state = 0

        if tag == "html" and self.stack:
            self.discard_depth += 1
            return
        if tag == "head" and (
            self.html_state >= 3
            or (self.stack and self.stack[-1].tag != "html")
        ):
            # a <head> is also discarded while ANY element is open other
            # than the root ('<frameset><head>' / '<noframes><head>' drop
            # it even though no body was ever implied — probed libxml2)
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
                elif (
                    tag == "frameset"
                    and len(self.stack) == 1
                    and self.stack[0].tag == "html"
                ):
                    # closing a ROOT-LEVEL frameset returns the insertion
                    # point to <html> and re-arms a later explicit <head>
                    # exactly like </head> does (probed libxml2:
                    # '<head><frameset></frameset><head>' keeps both
                    # heads; body_ever still suppresses implied ones)
                    self.html_state = 0
                return
            if _END_BLOCK.get(cur, _END_PRIORITY.get(cur, 100)) > prio:
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
            if self.root is not None and (self.saw_doctype or self.saw_misc):
                # with a DTD or prolog comment/PI present, stray doc-level
                # text after the root is discarded (observed libxml2)
                return
            if self.root is None:
                # implied <p> (libxml2's htmlCheckParagraph with empty stack)
                self._auto_close("p")
                self._check_implied("p")
                self._push_new("p")
            else:
                # after the root closed: re-open an html container (observed
                # libxml2 recovery behavior; html_state re-arms but
                # head/body_ever are inherited — see start()), then the
                # implied-p rule applies
                self.html_state = 0
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
        if not self.stack and self.root is None:
            # a document-level comment before the root makes after-root
            # content DISCARDED later (same gate as a doctype — probed:
            # '<!---->x</html>y' drops the y where 'x</html>y' nests it)
            self.saw_misc = True
        if self.remove_comments or not self.stack:
            return
        el = Element(Comment)
        el.text = content
        self.stack[-1].append(el)

    def pi(self, target: str, content: str):
        if not self.stack and self.root is None:
            self.saw_misc = True  # same after-root gate as comments
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
    #: source offset just past a consumed MISPLACED (after-content)
    #: doctype; a doctype starting exactly here stays literal text
    misplaced_doctype_end = -1

    def flush_text():
        if pending_text:
            t = "".join(pending_text)
            # a run containing ANY non-blank RAW char ends the prolog
            # blank skip — even when that char is an invalid control char
            # that gets dropped before emission ('\x1f<? >' keeps ' >',
            # '\x1f<!-- --> x' keeps ' x', while '  <? >x' still skips to
            # '>x'; probed libxml2).  The flag is applied AFTER this run's
            # own lstrip decision, which uses the state at run start.
            raw_nonblank = any(c not in " \t\n\r" for c in t)
            if not b.left_prolog and b.root is None and not b.stack:
                # prolog blank-skipping applies to the RAW stream only: an
                # invalid char (later dropped) already ends the skipping
                # libxml2's SKIP_BLANKS set is space/tab/cr/lf ONLY — \f and
                # \v are NOT blanks there; they are invalid chars that END
                # the prolog skip ('\x0b\rx' keeps the \r, ' \x0c x' keeps
                # the second space)
                t = t.lstrip(" \t\n\r")
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
                if last:
                    # any reference event — even a failed one — ends the
                    # prolog blank skip ('&# 0' keeps the space where
                    # '<!--c--> 0' does not; probed libxml2)
                    b.left_prolog = True
            if raw_nonblank:
                b.left_prolog = True
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
                # terminators: '-->' or '--!>' (whichever comes first);
                # an UNTERMINATED comment swallows the rest of the input
                # and produces NO node (probed: '<div><!--x' leaves div
                # empty — libxml2 discards the unfinished comment)
                flush_text()
                e1 = s.find("-->", i + 4)
                e2 = s.find("--!>", i + 4)
                if e2 >= 0 and (e1 < 0 or e2 < e1):
                    b.comment(_RE_INVALID_TEXT.sub("", s[i + 4 : e2]))
                    i = e2 + 4
                elif e1 >= 0:
                    b.comment(_RE_INVALID_TEXT.sub("", s[i + 4 : e1]))
                    i = e1 + 3
                else:
                    i = n
            elif _RE_DOCTYPE.match(s, i):
                # misplacement is judged on the RAW pending stream (a
                # dropped invalid char like \x08 still counts as content
                # — '\x08<!doctype x></div>' treats the doctype as
                # misplaced), then the pending run flushes BEFORE the
                # state updates so the marker's left_prolog side-effect
                # cannot retroactively keep blanks libxml2 skipped
                misplaced = (
                    b.left_prolog or b.saw_doctype or not in_prolog()
                )
                flush_text()
                end = s.find(">", i)
                stop = n if end < 0 else end + 1
                if i == misplaced_doctype_end:
                    # a doctype IMMEDIATELY after a consumed misplaced
                    # doctype stays literal ('0<!doctype x><!doctype y>'
                    # consumes both, but with zero chars between them the
                    # second survives); the '<' goes through the bogus-'<'
                    # path (raw text at the CURRENT insertion point,
                    # dropped in the prolog) and the remainder is plain
                    # chardata — '<html><!DOCTYPE a><!DOCTYPE b></html>'
                    # puts '<' in html.text and '!DOCTYPE b>' in an
                    # implied <p> (probed libxml2)
                    if not in_prolog():
                        b.raw_text("<")
                    pending_text.append(s[i + 1 : stop])
                    misplaced_doctype_end = -1
                else:
                    # misplaced = after content OR after a prior doctype
                    # (only the first prolog doctype is legitimate)
                    if misplaced:
                        misplaced_doctype_end = stop
                        # the misplaced-DTD error also ends the prolog
                        # blank skip ('<!dx><!dy> 0' keeps the space)
                        b.left_prolog = True
                    b.saw_doctype = True
                i = stop
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
            # PI target name-start per libxml2: an ASCII letter or any
            # non-ASCII character ('<?\xc0...?>' is consumed as a PI);
            # digits/punctuation make the '<?' bogus
            if _pi_name(s, i + 2) is None:
                # '<?' with no PI target name: only the two chars are
                # consumed, the rest (including any '?>') stays text, and
                # the prolog blank skip stays ARMED ('<??>' -> text '?>';
                # '  <? >x' -> '>x' — probed against libxml2)
                flush_text()
                i += 2
                continue
            end = s.find(">", i + 2)
            raw = s[i + 2 :] if end < 0 else s[i + 2 : end]
            name = _pi_name(raw, 0)
            if end < 0:
                # unterminated PI: when EOF comes right after the target
                # name the NAME becomes text ('<?a' -> 'a', 'x<?a' ->
                # 'xa'); anything after the name kills the whole rest
                # ('<?a b' / '<?a?' -> nothing) — probed libxml2
                if name is not None and name == raw and name.isascii():
                    # ASCII names only — an unterminated non-ASCII
                    # target vanishes with the rest ('<?\xc0' -> None).
                    # Flush first: the preceding run is its own chardata
                    # event ('</p> <?a' drops the lone blank, then 'a'
                    # merges into the same text node)
                    flush_text()
                    pending_text.append(name)
                    i = n
                    continue
                flush_text()
                i = n
                continue
            flush_text()
            if name is not None:
                b.pi(
                    name,
                    _RE_INVALID_TEXT.sub("", raw[len(name) :].lstrip(" \t\n\r\f\v")),
                )
            i = end + 1
        elif nxt == "/":
            if i == misplaced_doctype_end:
                # like a doctype, an END TAG with zero chars between it
                # and a consumed misplaced doctype stays literal
                # ('0<!doctype x></p>' -> '0</p>'); the '<' routes
                # through the bogus-'<' raw-text path at the CURRENT
                # insertion point, the rest is plain chardata; start
                # tags, comments and PIs there parse normally — probed
                flush_text()
                if not in_prolog():
                    b.raw_text("<")
                if _RE_ENDNAME.match(s, i + 2):
                    # named end tag: literal through its '>' but never
                    # across a '<' ('0<!doctype x></p<div>' keeps
                    # '0</p' and parses the <div> — probed libxml2)
                    gt = s.find(">", i + 2)
                    lt = s.find("<", i + 2)
                    stop = n if gt < 0 else gt + 1
                    if 0 <= lt < stop:
                        stop = lt
                else:
                    # bogus '</': only the two chars go literal, the rest
                    # reprocesses normally ('0<!doctype x></<div>' keeps
                    # '0</' and parses the <div> — probed libxml2)
                    stop = i + 2
                pending_text.append(s[i + 1 : stop])
                misplaced_doctype_end = -1
                i = stop
                continue
            m = _RE_ENDNAME.match(s, i + 2)
            if m:
                tag = m.group(0).lower()
                end = s.find(">", m.end())
                flush_text()
                b.left_prolog = True
                b.end(tag)
                i = n if end < 0 else end + 1
            else:
                # '</' followed by a non-name char: exactly the two chars
                # are discarded; the rest (including any '>') stays text.
                # This DOES end the prolog — '</ p>' keeps the blank in
                # ' p>' (probed), unlike a bogus '<?' which leaves the
                # prolog skip armed
                flush_text()
                b.left_prolog = True
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
                    while j < n and s[j] not in " \t\n\r>" and not (
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
                    # tuple membership: `'' in "\"'"` is True (substring
                    # test) and would index an empty unquoted value
                    if aval[:1] in ('"', "'"):
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
            i = j
            if tag in _RAWTEXT and not self_closing and b.stack and b.stack[-1].tag == tag:
                # CDATA mode (script/style), recovery semantics observed
                # from libxml2 — two alternating states:
                # - MARKUP-DISPATCH (at content start, and again right
                #   after every dispatched end tag): '</name...' tokens
                #   of ANY name are dispatched as real end tags
                #   (unmatched ones are swallowed — '<script></scriptx>
                #   </style>' drops both), a '<noscript' start closes a
                #   script, '</' + non-name drops the two chars, and
                #   anything else switches to CDATA;
                # - CDATA consumption: text accrues until the next '</'
                #   whose name PREFIX-matches the open tag (only that —
                #   '</style>' mid-script stays text); the matching
                #   token returns control to MARKUP-DISPATCH (so
                #   '</scriptx>' is swallowed and consumption resumes).
                el = b.stack[-1]
                pos = j
                parts = []
                # tag-specific escape start tags in MARKUP-DISPATCH state
                # (derived by probing the full tag universe at content
                # start): '<noscript' closes a script; '<body' and
                # '<frameset' close a style; none applies mid-CDATA
                escapes = (
                    ("<noscript",) if tag == "script" else ("<body", "<frameset")
                )
                while b.stack and b.stack[-1] is el and pos < n:
                    if any(
                        s[pos : pos + len(tok)].lower() == tok for tok in escapes
                    ):
                        b.end(tag)
                        break
                    if s.startswith("</", pos):
                        m2 = _RE_ENDNAME.match(s, pos + 2)
                        if m2:
                            gt = s.find(">", m2.end())
                            b.end(m2.group(0).lower())
                            pos = n if gt < 0 else gt + 1
                            continue
                        # '</' + non-name: the two chars are dropped;
                        # a '<' right after stays MARKUP ('<script></
                        # </div>' dispatches the next end tag), anything
                        # else resumes CDATA ('</ </div>' is text)
                        pos += 2
                        if pos < n and s[pos] == "<":
                            continue
                    # CDATA: consume until '</' + name-prefix-match
                    k = pos
                    while True:
                        k = s.find("</", k)
                        if k < 0:
                            parts.append(s[pos:])
                            pos = n
                            break
                        if s[k + 2 : k + 2 + len(tag)].lower() == tag:
                            parts.append(s[pos:k])
                            pos = k
                            break
                        k += 2
                txt = _RE_INVALID_TEXT.sub("", "".join(parts))
                if txt:
                    el.text = txt if el.text is None else el.text + txt
                i = pos
        else:
            flush_text()
            if not in_prolog():
                b.raw_text("<")
            b.left_prolog = True
            i += 1

    flush_text()
    return b.root
