"""Property-based parser equivalence: random small HTML documents must
parse to byte-identical trees vs the system libxml2 (when available).
Complements the fixture-corpus equality tests with adversarial input."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

try:
    import oracle_libxml2

    HAVE_ORACLE = oracle_libxml2.available()
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

from hypothesis import example, given, settings, strategies as st

import treediff

needs_oracle = pytest.mark.skipif(not HAVE_ORACLE, reason="libxml2 not available")

# head/body/html start tags are exercised by the pinned cases in
# treediff.SYNTHETIC_CASES; random interleavings hit libxml2 SAX-level
# node-merging pathologies that no real corpus exhibits
TAGS = [
    "div", "p", "span", "a", "b", "i", "ul", "li", "table", "tr", "td",
    "h1", "h2", "form", "center", "font", "br", "img", "script",
    "title", "foo", "text", "sup", "select", "option",
    "dl", "dd", "dt", "pre", "blockquote", "em", "strong", "noscript",
]

_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="<>&\x00",
        max_codepoint=0x2FF,
    ),
    max_size=12,
)

_attr = st.one_of(
    st.just(""),
    st.builds(
        lambda n, v: f' {n}="{v}"',
        st.sampled_from(["id", "class", "href", "nowrap", "data-x", "CLASS"]),
        _text,
    ),
    st.builds(
        lambda n, v: f" {n}={v}" if v else f" {n}",
        st.sampled_from(["id", "class", "width"]),
        st.text(alphabet="abc123%/", max_size=6),
    ),
)

_token = st.one_of(
    _text,
    st.builds(lambda t, a: f"<{t}{a}>", st.sampled_from(TAGS), _attr),
    st.builds(lambda t: f"</{t}>", st.sampled_from(TAGS)),
    st.builds(lambda c: f"<!--{c}-->", _text),
    st.sampled_from(
        ["&amp;", "&amp", "&nbsp;", "&#65;", "&#x41;", "&unknown;", "&",
         "<", ">", "<?php x ?>", "<![CDATA[z]]>",
         "< ", "<3", "</>", "<a href='q'>"]
    ),
)

_doc = st.builds(
    lambda pre, body: pre + body,
    st.sampled_from(["", "<!DOCTYPE html>", "<!DOCTYPE html PUBLIC \"x\">"]),
    st.lists(_token, max_size=30).map("".join),
)


@needs_oracle
@settings(max_examples=300, deadline=None)
@given(_doc)
@example(
    doc='<div id="".">',
).via('discovered failure')
@example(
    doc='&#',
).via('discovered failure')  # bare numeric-ref prefix: consumed, no tree
@example(
    doc='&#9;',
).via('charref-decoded whitespace is content, not an ignorable blank')
@example(
    doc='<p a="x&#1;y">q</p>',
).via('failed numeric ref truncates the attribute value')
def test_fuzz_tree_equality(doc):
    assert treediff.compare(doc) == [], doc


@needs_oracle
@settings(max_examples=150, deadline=None)
@given(_doc)
def test_fuzz_tree_equality_removal_mode(doc):
    assert treediff.compare(doc, remove_comments=True, remove_pis=True) == [], doc


# charref-dense dialect: random numeric refs (valid, invalid-codepoint,
# unterminated, digitless) interleaved with whitespace, tags and
# attribute values — the dialect that uncovered the '&#' family of
# divergences (round 5); kept as a standing suite
_charref = st.one_of(
    st.builds(
        lambda n, t: f"&#{n}{t}",
        st.integers(0, 0x110002),
        st.sampled_from([";", "", "a", " "]),
    ),
    st.builds(
        lambda n, t: f"&#x{n:x}{t}",
        st.integers(0, 0x110002),
        st.sampled_from([";", "", "g", " "]),
    ),
    st.sampled_from(
        ["&#", "&#x", "&#;", "&#x;", "&#X", "&", "&&#9;", "&amp;", "&amp",
         "&#9;", "&#32;", "&#10;", "&nbsp;", "&#0 ", " &# "]
    ),
)
_charref_token = st.one_of(
    _text,
    _charref,
    st.builds(
        lambda t, v: f'<{t} a="{v}">',
        st.sampled_from(TAGS),
        st.one_of(_text, _charref),
    ),
    st.builds(lambda t: f"</{t}>", st.sampled_from(TAGS)),
    st.sampled_from([" ", "\t", "<p>", "</p>", "<!--c-->"]),
)
_charref_doc = st.lists(_charref_token, max_size=16).map("".join)


@needs_oracle
@settings(max_examples=300, deadline=None)
@given(_charref_doc)
def test_fuzz_tree_equality_charrefs(doc):
    assert treediff.compare(doc) == [], doc


# round-5 dialect suites: each uncovered real divergences vs libxml2
# (misplaced-doctype literals, PI target name classes, rawtext
# markup-dispatch state, the thead/row-group end-tag blocking tier,
# empty unquoted attribute values); kept standing with their minimal
# counterexamples pinned.
_aname = st.sampled_from(["id", "class", "ID", "data-x", "x:y", "a.b", "_q"])
_attr2 = st.one_of(
    st.builds(lambda n, v: f' {n}="{v}"', _aname, st.text(alphabet="abc' =`", max_size=6)),
    st.builds(lambda n, v: f" {n}='{v}'", _aname, st.text(alphabet='abc" =`', max_size=6)),
    st.builds(lambda n, v: f" {n}={v}", _aname, st.text(alphabet="abc`%/\\", min_size=1, max_size=6)),
    st.builds(lambda n: f" {n}", _aname),
    st.builds(lambda n: f" {n}=", _aname),
    st.builds(lambda n, v: f' {n} = "{v}', _aname, st.text(alphabet="abc ", max_size=5)),
    st.sampled_from([" =x", ' "q"', " 'q'", " a==b", " a=b=c", " /q", " a/b=c"]),
)
_attr_doc = st.lists(
    st.one_of(
        _text,
        st.builds(lambda t, a1, a2, sl: f"<{t}{a1}{a2}{' /' if sl else ''}>",
                  st.sampled_from(TAGS), _attr2, _attr2, st.booleans()),
        st.builds(lambda t: f"</{t}>", st.sampled_from(TAGS)),
    ),
    max_size=10,
).map("".join)

_cmt_doc = st.lists(
    st.one_of(
        _text,
        st.builds(lambda c: f"<!--{c}-->", st.text(alphabet="ab- >!<", max_size=8)),
        st.builds(lambda c: f"<!--{c}", st.text(alphabet="ab- >!", max_size=6)),
        st.sampled_from(
            ["<!-->", "<!--->", "<!---->", "<!-- -- -->", "<!>", "<! >", "<!x>",
             "<!--a--!>", "<![CDATA[z]]>", "<![CDATA[", "<!doctype x>",
             "<!DOCTYPEhtml>", "</p>", "</div>", " ", "<p>", "<div>", "0"]
        ),
    ),
    max_size=12,
).map("".join)

_pi_doc = st.lists(
    st.one_of(
        _text,
        st.builds(
            lambda c, t: f"<?{c}{t}",
            st.characters(codec="utf-8", exclude_characters="<>&\x00", max_codepoint=0xFFFF),
            st.sampled_from(["", "?>", ">", " ?>y", "x?>"]),
        ),
        st.sampled_from(["<??>", "<?>", "<?php x ?>", "<? >", "<?9>", "<?a",
                         "<?:?>", "<?_?>", "<?.?>", "<p>", "</p>", " "]),
    ),
    max_size=8,
).map("".join)

_raw_doc = st.lists(
    st.sampled_from(
        ["<script>", "<style>", "</script>", "</style>", "</scr", "<!--", "-->",
         "</script >", "</scriptx>", "</stylex>", "x", "<p>", "</p>", "'", '"',
         "--!>", "<noscript>", "</b>", "</123>"]
    ),
    max_size=12,
).map("".join)

_table_doc = st.lists(
    st.sampled_from(
        ["<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>", "<th>", "</th>",
         "<tbody>", "</tbody>", "<thead>", "</thead>", "<tfoot>", "</tfoot>",
         "<caption>", "</caption>", "<col>", "<colgroup>", "x", "<p>", "<div>", "</div>"]
    ),
    max_size=16,
).map("".join)


@needs_oracle
@settings(max_examples=200, deadline=None)
@given(_attr_doc)
@example(doc='<div id="" id=>').via('empty unquoted value crashed the quote check')
def test_fuzz_attr_pathology(doc):
    assert treediff.compare(doc) == [], doc


@needs_oracle
@settings(max_examples=200, deadline=None)
@given(_cmt_doc)
@example(doc='<div><!--x').via('unterminated comments are dropped')
@example(doc='<p><!--x--!>y').via("'--!>' also terminates a comment")
@example(doc='0<!doctype x><!doctype x>').via('adjacent misplaced doctype stays literal')
@example(doc='0<!doctype x></p>').via('end tag adjacent to misplaced doctype stays literal')
@example(doc='<!doctype x><!doctype x><!doctype x>').via('prolog literal drops the bogus <')
@example(doc='<!--<!--> --><!doctype x>').via('pending run flushes before doctype state updates')
def test_fuzz_comments_doctype(doc):
    assert treediff.compare(doc) == [], doc


@needs_oracle
@settings(max_examples=200, deadline=None)
@given(_pi_doc)
@example(doc='<??>').via("'<?' with no target consumes two chars only")
@example(doc='<?a').via('unterminated ASCII target becomes text')
@example(doc='<?ʩ').via('XML 1.0 BaseChar table, not modern isalpha')
@example(doc='<?:?>').via("':' and '_' start a PI target")
@example(doc='</p> <?a').via('preceding run flushes before the orphan target')
@example(doc='\x1f<? >').via(
    'dropped invalid char still ends the prolog blank skip across a flush'
)
def test_fuzz_pis(doc):
    assert treediff.compare(doc) == [], doc


@needs_oracle
@settings(max_examples=200, deadline=None)
@given(_raw_doc)
@example(doc='<script></scriptx></style>').via('markup-dispatch state after swallowed end tag')
@example(doc='<script>a</scriptx><noscript>x').via('noscript close applies after mid-CDATA break')
def test_fuzz_rawtext(doc):
    assert treediff.compare(doc) == [], doc


@needs_oracle
@settings(max_examples=200, deadline=None)
@given(_table_doc)
@example(doc='<tr><thead></tr><thead>').via('thead blocks same-tier end tags')
@example(doc='<th><div><tbody></th><table>').via('row-group end-tag blocking behind a shield')
def test_fuzz_tables(doc):
    assert treediff.compare(doc) == [], doc


# structural dialect: html/head/body/frameset instances, doctypes,
# comments/PIs at document level, after-root recovery — uncovered the
# nested-html re-open state rules, the saw_misc after-root gate, the
# frameset/body rawtext escapes and the </head>-through-body pop
_struct_doc = st.lists(
    st.sampled_from(
        ["<html>", "</html>", "<head>", "</head>", "<body>", "</body>",
         "<title>", "</title>", "<meta>", "<link>", "<base>", "<script>",
         "</script>", "<style>", "</style>", "x", " ", "<p>", "</p>",
         "<div>", "</div>", "<!DOCTYPE html>", "<frameset>", "</frameset>",
         "<noframes>", "</noframes>", "<frame>", "<!--c-->", "<?a?>",
         "<noscript>", "</noscript>"]
    ),
    max_size=14,
).map("".join)


@needs_oracle
@settings(max_examples=250, deadline=None)
@given(_struct_doc)
@example(doc='<head></html><head>').via('nested html re-accepts an explicit head')
@example(doc='<head></html><meta>').via('head_ever inherited: no implied head in nested html')
@example(doc='x</html><title>').via('implied head suppressed once body content seen')
@example(doc='<!---->0</html>0').via('prolog comment gates after-root discard')
@example(doc='<title><frameset>').via('frameset start-closes title+head')
@example(doc='<style><body>').via('body escapes style rawtext at content start')
@example(doc='<frameset><head>').via('head discarded while a non-root element is open')
@example(doc='<head><frameset></frameset><head>').via('root-level </frameset> re-arms an explicit head')
@example(doc='<head><noframes><body></head><head>').via('</head> pops through body (end priority 180)')
@example(doc='<html><!DOCTYPE html></html>').via('literal < routes through raw_text insertion point')
def test_fuzz_structure(doc):
    assert treediff.compare(doc) == [], doc


# grand-mixed dialect: every token family interleaved — catches
# interaction bugs between the per-family rules (rawtext markup-state ×
# bogus end tags, misplaced-doctype literals × bogus '</', invalid
# chars × doctype misplacement)
_grand_tok = st.one_of(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00", max_codepoint=0x3FF),
        max_size=8,
    ),
    st.builds(lambda t: f"<{t}>", st.sampled_from(
        TAGS + ["table", "tr", "td", "thead", "tbody", "title", "noscript",
                "frameset", "noframes", "head", "body", "html"])),
    st.builds(lambda t: f"</{t}>", st.sampled_from(
        TAGS + ["table", "tr", "td", "thead", "title", "head", "body",
                "html", "script", "style"])),
    st.sampled_from(
        ["&#", "&#x41", "&#9;", "&#0 ", "&amp;", "&amp", "<!--c-->", "<!--",
         "-->", "--!>", "<!doctype x>", "<??>", "<?a", "<?a?>", "<script>",
         "<style>", "</scriptx>", " ", "\t", "<", ">", "</", "<!", "<3",
         '<div id="" id=>', "<p a='&#1;x'>", "</.", "</.x>", "</_x>", "</-",
         "\x08"]
    ),
)
_grand_doc = st.lists(_grand_tok, max_size=20).map("".join)


@needs_oracle
@settings(max_examples=300, deadline=None)
@given(_grand_doc)
@example(doc='<script></</div>').via("dropped '</' followed by '<' stays in markup state")
@example(doc='0<!doctype x></<div>').via("bogus '</' at the doctype mark goes literal as two chars")
@example(doc='\x08<!doctype x></div>').via('dropped invalid char still counts for misplacement')
@example(doc='0<!doctype x></p<div>').via("literal end tag never crosses a '<'")
@example(doc='</.').via("'.', '_' and ':' start END-tag names")
def test_fuzz_grand_mixed(doc):
    assert treediff.compare(doc) == [], doc
