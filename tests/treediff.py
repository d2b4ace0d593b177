"""Helpers to compare learnhtml_spark.htmlparse trees against the libxml2
oracle (tests/oracle_libxml2.py) — dev/test only."""

from __future__ import annotations

from learnhtml_spark import htmlparse as hp

SYNTHETIC_CASES = [
    '<html><body> <div>a</div> <div>b</div> </body></html>',
    '<div> <span>a</span> <span>b</span> </div>',
    '<div>a <b>c</b> <i>d</i> </div>',
    '<body><p>a</p> <p>b</p></body>',
    '<html>hello<div>x</div></html>',
    'hello world',
    '<title>t</title><div>x</div>',
    '<p><a href=1>one<a href=2>two</p>',
    '<p>one<p>two',
    '<table><tr><td><p>x</td></tr></table>',
    '<ul><li>a<li>b</ul>',
    '<p><font><b>x<p>y',
    '<div> <!-- c --> <span>s</span></div>',
    '<div><span>a</span> </div>',
    '<div> </div>',
    '<p>a &amp b &copy c</p>',
    '<div id=a id=b class="x">t</div>',
    '<div><embed src=x>text</div>',
    '<text id="u">z<table><tr><td>y</td></tr></table></text>',
    '<body>\n<h2>t</h2>\n<ul>\n<li>x</li>\n</ul>\n</body>',
    '<body><div>a</div></p>after</body>',
    '<body>a</br>b</body>',
    '<div><br/><img src=x/>t<span/>u</div>',
    '<!DOCTYPE html><html><body><p>x</p></body></html>',
    '<div><![CDATA[raw <b> &amp; ]]></div>',
    '<p>a < b and <3 hearts</p>',
    '<script>if (a<b) { x="</div>"; } &amp;</script><div>y</div>',
    '<DIV CLASS="Big">x</DIV>',
    '<a href="a&amp;b&ampc" title=\'q&#65;r\'>t</a>',
    '<html lang=en><body><div>x</div><html id=z><body class=c>',
    '<body><div>x</div><head><title>t</title></head>',
    '<td width=510 align=left-x nowrap>x</td>',
    '<input type=checkbox checked><option selected>o</option>',
    '<p>x<foo@bar>y</p>',
    '<p>a <<b>c</p>',
    '<div><!-- a -- b --><span>s</span></div>',
    '<div><?php echo 1 ?><span>s</span></div>',
    '<table><tr><td><table><tr><td>i</td></tr></table></td></tr>'
    '<tr><td>z</td></tr></table>',
    '<table><tr><td>a<tr><td>b</table>',
    '<center><font size=2>x<center>y',
    '<form><p>a<form><p>b',
    '<html>\n<head>\n<title>t</title>\n</head>\n<body>\n<p>x</p>\n</body>\n</html>',
    '<select><option>a<option>b</select>',
    '<div DATA-Foo="1" NOWRAP>x</div>',
    'leading\n<html><body><p>x</p></body></html>trailing',
    '\n   <html><body><p>x</p></body></html>\n',
    '<p>&apos;q&quot;r&nbsp;s</p>',
    '<p>&#x41;&#66;&#xe9;</p>',
    '<body><div>a</div></body><div>late</div>',
    '<html><head><script>s</script>text here<div>d</div></head>',
    '<html><head><title>t</title></head><b>bold</b><div>x</div></html>',
    '<ul><li><a href=x>anchor<li>second</ul>',
    '<p>a&nbsp;b</p>',
    '<ul><?xml version="1.0" encoding="utf-16"?><li>x</li></ul>',
    '<html><body><p>x</p></body></html><div>late</div>',
    '<html><body><p>x</p></body></html>late',
    '<html><body><p>x</p>late',
    '<html><head><title>t</title></head><frameset><frame src=a>'
    '<noframes>nf</noframes></frameset>',
    # head/body state-machine cases (implied flags vs resettable discard)
    '0</body><head>',
    '0</body><head>x',
    '0</body><body>y',
    '<head><title>t</title></head><head>x',
    '<head></head><body>b</body><head>h',
    '<body>b</body><body>c',
    '<body>b</body>mid<body>c',
    '<body>b<div>d</div></body><body>c',
    '<body>b</body><head><title>t2',
    '0<head>0',
    'x<body>y',
    '<title>t</title><div>x</div>',
    # recovery-text and prolog cases
    '< 0',
    '< <![CDATA[z]]>',
    '<div></body><![CDATA[z]]>',
    '<head><![CDATA[z]]>',
    '<script></div>x</script>y',
    '<script>a</div>b</script>c',
    '<script>a</scriptx>b</script>c',
    '<script></>x</script>y',
    '<A<!---->',
    '<a<p>q',
    '<div id=1<p>q',
    '\x1f',
    '<p>a\x1fb\x0bc\x0cd\x7fe</p>',
    '<p\x1f id=q>t</p>',
]


def to_dict(el):
    """Convert an htmlparse Element into the oracle's dict-tree shape."""
    if el is None:
        return None
    if not isinstance(el.tag, str):
        tag = '#comment' if el.tag is hp.Comment else '#pi'
        return {
            'tag': tag,
            'attrib': [] if tag == '#comment'
            else [('target', el.attrib.get('target', ''))],
            'text': el.text,
            'children': [],
            'tail': el.tail,
        }
    return {
        'tag': el.tag,
        'attrib': list(el.attrib.items()),
        'text': el.text,
        'children': [to_dict(c) for c in el._children],
        'tail': el.tail,
    }


def diff(a, b, path='/'):
    """Yield human-readable discrepancies between oracle dict `a` and ours."""
    if a is None and b is None:
        return
    if (a is None) != (b is None):
        yield f"{path}: presence {a is not None} vs {b is not None}"
        return
    if a['tag'] != b['tag']:
        yield f"{path}: tag {a['tag']} vs {b['tag']}"
        return
    p = path + a['tag'] + '/'
    if dict(a['attrib']) != dict(b['attrib']):
        yield f"{p}: attrib {a['attrib']} vs {b['attrib']}"
    if (a['text'] or '') != (b['text'] or ''):
        yield f"{p}: text {a['text']!r} vs {b['text']!r}"
    if (a['tail'] or '') != (b['tail'] or ''):
        yield f"{p}: tail {a['tail']!r} vs {b['tail']!r}"
    if len(a['children']) != len(b['children']):
        yield (
            f"{p}: nchildren {len(a['children'])} "
            f"({[c['tag'] for c in a['children']]}) vs {len(b['children'])} "
            f"({[c['tag'] for c in b['children']]})"
        )
    for i, (ca, cb) in enumerate(zip(a['children'], b['children'])):
        yield from diff(ca, cb, p + str(i) + ':')


def compare(html, remove_comments=False, remove_pis=False):
    """Parse with both parsers, return list of discrepancies."""
    import oracle_libxml2 as o

    a = o.parse_html(html, remove_comments=remove_comments,
                     remove_pis=remove_pis)
    mine = hp.parse_html(html, remove_comments=remove_comments,
                         remove_pis=remove_pis)
    return list(diff(a, to_dict(mine)))
