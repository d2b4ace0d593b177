"""Per-node DOM feature extraction (the reference's feature semantics).

Produces, for every node of a document (comments and PIs included), the
reference's feature frame (learnhtml/features.py):

- 10 local features: depth, sibling_pos, tag, no_classes, id_len,
  class_len, no_children, text_len, class_text, id_text
  (features.py:117-139; tag of a comment/PI node is 'html_comment',
  features.py:28-29; text_len is the subtree text length, 0 for
  comments/PIs, features.py:32-40)
- descendant aggregates per level 1..depth: no_nodes, *_avg, and the
  comma-joined classes/ids/tags strings (features.py:152-183,225-257).
  NB the reference joins each descendant's class string with
  ``' '.join(str)`` — i.e. characters space-interleaved; that quirk is
  part of the golden contract and replicated here.
- ancestor features per level 1..height, zero/empty padded
  (features.py:107-114,196-223).
- the node's XPath as ``path``.

All columns are computed in one pass over the node list with explicit
parent-index arrays — no recursion, suitable for running per document
inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from learnhtml_spark.htmlparse import Element, getpath, parse_html

LOCAL_COLUMNS = [
    "depth",
    "sibling_pos",
    "tag",
    "no_classes",
    "id_len",
    "class_len",
    "no_children",
    "text_len",
    "class_text",
    "id_text",
]

DESCENDANT_FEATURES = [
    "no_nodes",
    "no_children_avg",
    "id_len_avg",
    "no_classes_avg",
    "class_len_avg",
    "text_len_avg",
    "classes",
    "ids",
    "tags",
]

#: zero/empty padding for missing ancestors, aligned with LOCAL_COLUMNS
_EMPTY_LOCAL = (0, 0, "", 0, 0, 0, 0, 0, "", "")


def ancestor_columns(height: int) -> list[str]:
    return [
        f"ancestor{i}_{name}"
        for i in range(1, height + 1)
        for name in LOCAL_COLUMNS
    ]


def descendant_columns(depth: int) -> list[str]:
    return [
        f"descendant{i}_{name}"
        for i in range(1, depth + 1)
        for name in DESCENDANT_FEATURES
    ]


def feature_columns(depth: int, height: int) -> list[str]:
    """Full column list in the reference's concatenation order
    (local, descendant, ancestor, path)."""
    return (
        LOCAL_COLUMNS + descendant_columns(depth) + ancestor_columns(height) + ["path"]
    )


def extract_features_from_tree(
    root: Element,
    depth: int,
    height: int,
    select_nodes=None,
    as_columns: bool = False,
) -> pd.DataFrame:
    """Feature frame for the nodes of a parsed tree, document order.

    ``select_nodes`` (optional set of Element identities, ``id(el)``)
    restricts the OUTPUT rows (e.g. block-start nodes only for the serving
    path) — every feature is still computed over the whole tree, so values
    are identical to the full frame; only row assembly is skipped.
    ``as_columns`` returns the raw {column: array/list} dict instead of a
    DataFrame so callers can concatenate many documents into one frame
    (per-doc DataFrame construction dominates the profile otherwise)."""
    nodes = list(root.iter())
    n = len(nodes)
    index = {id(node): i for i, node in enumerate(nodes)}
    parent_l = [-1] * n
    for i, node in enumerate(nodes):
        p = node._parent
        if p is not None:
            parent_l[i] = index[id(p)]

    # ---- local features ---------------------------------------------------
    # built as plain python lists and converted to numpy once at the end:
    # per-element numpy scalar reads/writes inside these per-node loops cost
    # ~100ns each and trees average a few dozen nodes, so array dispatch
    # overhead dominated the array-in-the-loop form
    depth_l = [0] * n
    for i in range(n):
        p = parent_l[i]
        depth_l[i] = depth_l[p] + 1 if p >= 0 else 1
    depth_arr = np.asarray(depth_l, dtype=np.int64)

    sp = [0] * n
    for node in nodes:
        for k, child in enumerate(node._children):
            sp[index[id(child)]] = k
    sibling_pos = np.asarray(sp, dtype=np.int64)

    is_el = [isinstance(node.tag, str) for node in nodes]
    tags = [node.tag if e else "html_comment" for node, e in zip(nodes, is_el)]
    class_text = [
        node.attrib.get("class", "") if e else "" for node, e in zip(nodes, is_el)
    ]
    id_text = [
        node.attrib.get("id", "") if e else "" for node, e in zip(nodes, is_el)
    ]
    no_classes_l = [len(c.split()) for c in class_text]
    id_len_l = [len(s) for s in id_text]
    class_len_l = [len(c) for c in class_text]
    no_children_l = [len(node._children) for node in nodes]
    no_classes = np.asarray(no_classes_l, dtype=np.int64)
    id_len = np.asarray(id_len_l, dtype=np.int64)
    class_len = np.asarray(class_len_l, dtype=np.int64)
    no_children = np.asarray(no_children_l, dtype=np.int64)

    # subtree text length, bottom-up (reverse document order): the subtree
    # text of an element is its text + each child's subtree text + tail;
    # comment/PI children contribute only their tails (lxml itertext rule)
    tl = [0] * n
    for i in range(n - 1, -1, -1):
        node = nodes[i]
        total = len(node.text) if node.text else 0
        for child in node._children:
            ci = index[id(child)]
            if isinstance(child.tag, str):
                total += tl[ci]
            if child.tail:
                total += len(child.tail)
        tl[i] = total
    text_len_l = [t if e else 0 for t, e in zip(tl, is_el)]
    text_len = np.asarray(text_len_l, dtype=np.int64)

    if select_nodes is None:
        keep = None
        kept = list(range(n))
    else:
        keep = np.fromiter(
            (id(node) in select_nodes for node in nodes), dtype=bool, count=n
        )
        kept = [i for i in range(n) if keep[i]]

    def col_num(arr):
        return arr if keep is None else arr[keep]

    def col_str(lst):
        return lst if keep is None else [lst[i] for i in kept]

    # accumulate every column into one dict and build the frame once at the
    # end — per-column DataFrame.__setitem__ dominates the profile otherwise
    data = {
        "depth": col_num(depth_arr),
        "sibling_pos": col_num(sibling_pos),
        "tag": col_str(tags),
        "no_classes": col_num(no_classes),
        "id_len": col_num(id_len),
        "class_len": col_num(class_len),
        "no_children": col_num(no_children),
        "text_len": col_num(text_len),
        "class_text": col_str(class_text),
        "id_text": col_str(id_text),
    }

    # ---- descendant aggregates --------------------------------------------
    # aggregates are only needed for the KEPT rows, so one pass walks each
    # node's ancestor chain (≤ depth steps) and accumulates straight into
    # the kept ancestor's row — replacing the per-level bincount/gather
    # machinery whose ~30 tiny-array numpy dispatches per document
    # dominated this kernel (trees average a few dozen nodes).  Sums
    # accumulate in document order of the contributing node, the same
    # order np.bincount added them, and integer partial sums are exact in
    # float64, so every average is bit-identical to the vectorized form.
    if depth > 0:
        nk = len(kept)
        kept_pos = {node: row for row, node in enumerate(kept)}
        counts = [[0] * nk for _ in range(depth)]
        sums = [[[0] * nk for _ in range(5)] for _ in range(depth)]
        l_classes = [[[] for _ in range(nk)] for _ in range(depth)]
        l_ids = [[[] for _ in range(nk)] for _ in range(depth)]
        l_tags = [[[] for _ in range(nk)] for _ in range(depth)]
        for i in range(n):
            a = parent_l[i]
            lvl = 0
            while a >= 0 and lvl < depth:
                row = kept_pos.get(a)
                if row is not None:
                    counts[lvl][row] += 1
                    s = sums[lvl]
                    s[0][row] += no_children_l[i]
                    s[1][row] += id_len_l[i]
                    s[2][row] += no_classes_l[i]
                    s[3][row] += class_len_l[i]
                    s[4][row] += text_len_l[i]
                    # reference quirk: ' '.join over the class string's chars
                    l_classes[lvl][row].append(" ".join(class_text[i]))
                    l_ids[lvl][row].append(id_text[i])
                    l_tags[lvl][row].append(tags[i])
                a = parent_l[a]
                lvl += 1
        for lvl in range(depth):
            pre = f"descendant{lvl + 1}_"
            c = counts[lvl]
            data[pre + "no_nodes"] = np.asarray(c, dtype=np.int64)
            for k, name in enumerate(
                ("no_children_avg", "id_len_avg", "no_classes_avg",
                 "class_len_avg", "text_len_avg")
            ):
                s = sums[lvl][k]
                data[pre + name] = np.asarray(
                    [s[r] / c[r] if c[r] else 0.0 for r in range(nk)],
                    dtype=np.float64,
                )
            data[pre + "classes"] = [",".join(x) for x in l_classes[lvl]]
            data[pre + "ids"] = [",".join(x) for x in l_ids[lvl]]
            data[pre + "tags"] = [",".join(x) for x in l_tags[lvl]]

    # ---- ancestor features -------------------------------------------------
    if height > 0:
        local_rows = list(
            zip(
                depth_l,
                sp,
                tags,
                no_classes_l,
                id_len_l,
                class_len_l,
                no_children_l,
                text_len_l,
                class_text,
                id_text,
            )
        )
        anc_chains = []
        for i in kept:
            chain = []
            a = parent_l[i]
            for _h in range(height):
                if a < 0:
                    break
                chain.append(a)
                a = parent_l[a]
            anc_chains.append(chain)
        for h in range(height):
            col_rows = [
                local_rows[c[h]] if h < len(c) else _EMPTY_LOCAL
                for c in anc_chains
            ]
            pre = f"ancestor{h + 1}_"
            # one C-level transpose instead of a listcomp per column
            cols = list(zip(*col_rows)) or [()] * len(LOCAL_COLUMNS)
            for k, name in enumerate(LOCAL_COLUMNS):
                if name in ("tag", "class_text", "id_text"):
                    data[pre + name] = list(cols[k])
                else:
                    data[pre + name] = np.asarray(cols[k], dtype=np.int64)

    data["path"] = [getpath(nodes[i]) for i in kept]
    if as_columns:
        return data
    return pd.DataFrame(data, columns=feature_columns(depth, height))


def extract_features_from_html(html: str, depth: int, height: int) -> pd.DataFrame:
    """Parse (comments/PIs kept, as the reference's feature path does) and
    extract the full feature frame."""
    root = parse_html(html, remove_comments=False, remove_pis=False)
    if root is None:
        root = parse_html("<html><head></head><body></body></html>")
    return extract_features_from_tree(root, depth, height)
