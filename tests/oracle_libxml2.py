"""Dev-time test oracle: parse HTML with the system libxml2 via ctypes.

The production engine (`learnhtml_spark.htmlparse`) is a from-scratch,
pure-Python HTML tree builder.  The reference (nikitautiu/learnhtml) parsed
documents with lxml, i.e. libxml2's recovering HTML parser
(reference: learnhtml/features.py:280, learnhtml/dataset_conversion/
blocks.pyx:853-855).  To verify that our pure-Python parser produces the
same trees, tests compare it against the system libxml2 shared library
(2.9.x, the same generation the reference used).  This module is test-only
and is skipped automatically when libxml2 is not present.
"""

from __future__ import annotations

import ctypes
import ctypes.util

# Node types (libxml2 xmlElementType)
ELEMENT_NODE = 1
TEXT_NODE = 3
CDATA_SECTION_NODE = 4
PI_NODE = 7
COMMENT_NODE = 8
DOCUMENT_NODE = 9
HTML_DOCUMENT_NODE = 13
DTD_NODE = 14

# htmlParserOption
HTML_PARSE_RECOVER = 1 << 0
HTML_PARSE_NOERROR = 1 << 5
HTML_PARSE_NOWARNING = 1 << 6
HTML_PARSE_NONET = 1 << 11


class _XmlNode(ctypes.Structure):
    pass


_XmlNode._fields_ = [
    ("_private", ctypes.c_void_p),
    ("type", ctypes.c_int),
    ("name", ctypes.c_char_p),
    ("children", ctypes.POINTER(_XmlNode)),
    ("last", ctypes.POINTER(_XmlNode)),
    ("parent", ctypes.POINTER(_XmlNode)),
    ("next", ctypes.POINTER(_XmlNode)),
    ("prev", ctypes.POINTER(_XmlNode)),
    ("doc", ctypes.c_void_p),
    ("ns", ctypes.c_void_p),
    ("content", ctypes.c_char_p),
    ("properties", ctypes.POINTER(_XmlNode)),  # xmlAttr shares leading layout
    ("nsDef", ctypes.c_void_p),
    ("psvi", ctypes.c_void_p),
    ("line", ctypes.c_ushort),
    ("extra", ctypes.c_ushort),
]


def _load():
    for cand in (
        "/usr/lib/x86_64-linux-gnu/libxml2.so.2",
        ctypes.util.find_library("xml2"),
    ):
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    else:
        return None
    lib.htmlReadMemory.restype = ctypes.POINTER(_XmlNode)
    lib.htmlReadMemory.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.xmlFreeDoc.argtypes = [ctypes.c_void_p]
    lib.xmlNodeGetContent.restype = ctypes.c_void_p
    lib.xmlNodeGetContent.argtypes = [ctypes.POINTER(_XmlNode)]
    lib.xmlFree = ctypes.CDLL(None).free if hasattr(ctypes.CDLL(None), "free") else None
    return lib


_LIB = _load()


def available() -> bool:
    return _LIB is not None


def _attr_value(lib, attr) -> str:
    # concatenate the attribute's text children (entity refs are already
    # resolved by the HTML parser, so these are plain text nodes)
    parts = []
    child = attr.contents.children
    while child:
        content = child.contents.content
        if content:
            parts.append(content.decode("utf-8", "replace"))
        child = child.contents.next
    return "".join(parts)


def _convert(lib, node, remove_comments: bool, remove_pis: bool):
    """Convert one libxml2 element node into a plain dict tree.

    Returns {"tag": str|"#comment"|"#pi", "attrib": [(k,v)...],
             "text": str|None, "children": [...], "tail": str|None}
    Text/tails are attached lxml-style.  When remove_comments/remove_pis,
    those nodes are dropped and surrounding text runs merge (this is how
    lxml's parser flags behave: the node is never emitted so adjacent
    text accumulates).
    """
    out = {
        "tag": node.contents.name.decode("utf-8", "replace"),
        "attrib": [],
        "text": None,
        "children": [],
        "tail": None,
    }
    attr = node.contents.properties
    while attr:
        name = attr.contents.name.decode("utf-8", "replace")
        out["attrib"].append((name, _attr_value(lib, attr)))
        attr = attr.contents.next

    def add_text(s: str):
        if out["children"]:
            prev = out["children"][-1]
            prev["tail"] = (prev["tail"] or "") + s
        else:
            out["text"] = (out["text"] or "") + s

    child = node.contents.children
    while child:
        t = child.contents.type
        if t == ELEMENT_NODE:
            out["children"].append(
                _convert(lib, child, remove_comments, remove_pis)
            )
        elif t in (TEXT_NODE, CDATA_SECTION_NODE):
            content = child.contents.content
            add_text(content.decode("utf-8", "replace") if content else "")
        elif t == COMMENT_NODE:
            if not remove_comments:
                content = child.contents.content
                out["children"].append(
                    {
                        "tag": "#comment",
                        "attrib": [],
                        "text": content.decode("utf-8", "replace")
                        if content
                        else "",
                        "children": [],
                        "tail": None,
                    }
                )
        elif t == PI_NODE:
            if not remove_pis:
                content = child.contents.content
                out["children"].append(
                    {
                        "tag": "#pi",
                        "attrib": [
                            ("target", child.contents.name.decode("utf-8"))
                        ],
                        "text": content.decode("utf-8", "replace")
                        if content
                        else "",
                        "children": [],
                        "tail": None,
                    }
                )
        child = child.contents.next
    return out


def parse_html(
    data: bytes | str,
    remove_comments: bool = False,
    remove_pis: bool = False,
):
    """Parse with libxml2's recovering HTML parser; return dict tree of the
    root element (usually <html>) or None if parsing yields no root."""
    if _LIB is None:
        raise RuntimeError("libxml2 not available")
    if isinstance(data, str):
        data = data.encode("utf-8")
    opts = HTML_PARSE_RECOVER | HTML_PARSE_NOERROR | HTML_PARSE_NOWARNING | HTML_PARSE_NONET
    doc = _LIB.htmlReadMemory(data, len(data), b"test.html", None, opts)
    if not doc:
        return None
    try:
        child = doc.contents.children
        root = None
        while child:
            if child.contents.type == ELEMENT_NODE:
                root = _convert(_LIB, child, remove_comments, remove_pis)
                break
            child = child.contents.next
        return root
    finally:
        _LIB.xmlFreeDoc(ctypes.cast(doc, ctypes.c_void_p))
