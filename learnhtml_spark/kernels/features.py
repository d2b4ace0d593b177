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
    parent = np.full(n, -1, dtype=np.int64)
    for i, node in enumerate(nodes):
        p = node._parent
        if p is not None:
            parent[i] = index[id(p)]

    # ---- local features ---------------------------------------------------
    depth_arr = np.zeros(n, dtype=np.int64)
    for i in range(n):
        depth_arr[i] = depth_arr[parent[i]] + 1 if parent[i] >= 0 else 1

    sibling_pos = np.zeros(n, dtype=np.int64)
    for i, node in enumerate(nodes):
        for k, child in enumerate(node._children):
            sibling_pos[index[id(child)]] = k

    tags = [t if isinstance(t := node.tag, str) else "html_comment" for node in nodes]
    is_element = np.fromiter(
        (isinstance(node.tag, str) for node in nodes), dtype=bool, count=n
    )
    class_text = [node.attrib.get("class", "") if isinstance(node.tag, str) else "" for node in nodes]
    id_text = [node.attrib.get("id", "") if isinstance(node.tag, str) else "" for node in nodes]
    no_classes = np.fromiter((len(c.split()) for c in class_text), np.int64, n)
    id_len = np.fromiter((len(s) for s in id_text), np.int64, n)
    class_len = np.fromiter((len(c) for c in class_text), np.int64, n)
    no_children = np.fromiter((len(node._children) for node in nodes), np.int64, n)

    # subtree text length, bottom-up (reverse document order): the subtree
    # text of an element is its text + each child's subtree text + tail;
    # comment/PI children contribute only their tails (lxml itertext rule)
    text_len = np.zeros(n, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        node = nodes[i]
        total = len(node.text) if node.text else 0
        for child in node._children:
            ci = index[id(child)]
            if isinstance(child.tag, str):
                total += text_len[ci]
            if child.tail:
                total += len(child.tail)
        text_len[i] = total
    text_len = np.where(is_element, text_len, 0)

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
    # the level-L ancestor of every node is computed by vectorized gather
    # chaining; numeric per-(ancestor, level) sums are bincounts, and the
    # comma-joined string lists are assembled only for the kept rows
    if depth > 0:
        node_idx = np.arange(n)
        kept_mask = np.zeros(n, dtype=bool)
        kept_mask[kept] = True
        kept_pos = {node: row for row, node in enumerate(kept)}
        anc = parent.copy()
        for lvl in range(depth):
            valid = anc >= 0
            tgt = anc[valid]
            c = np.bincount(tgt, minlength=n).astype(np.int64)
            safe = np.where(c > 0, c, 1)
            pre = f"descendant{lvl + 1}_"
            data[pre + "no_nodes"] = col_num(c)
            for name, src in (
                ("no_children_avg", no_children),
                ("id_len_avg", id_len),
                ("no_classes_avg", no_classes),
                ("class_len_avg", class_len),
                ("text_len_avg", text_len),
            ):
                sums = np.bincount(tgt, weights=src[valid], minlength=n)
                data[pre + name] = col_num(np.where(c > 0, sums / safe, 0.0))

            l_classes = [[] for _ in kept]
            l_ids = [[] for _ in kept]
            l_tags = [[] for _ in kept]
            sel = valid & kept_mask[np.maximum(anc, 0)]
            for i in node_idx[sel]:
                row = kept_pos[anc[i]]
                # reference quirk: ' '.join over the class string's chars
                l_classes[row].append(" ".join(class_text[i]))
                l_ids[row].append(id_text[i])
                l_tags[row].append(tags[i])
            data[pre + "classes"] = [",".join(x) for x in l_classes]
            data[pre + "ids"] = [",".join(x) for x in l_ids]
            data[pre + "tags"] = [",".join(x) for x in l_tags]

            anc = np.where(valid, parent[np.maximum(anc, 0)], -1)

    # ---- ancestor features -------------------------------------------------
    if height > 0:
        local_rows = list(
            zip(
                depth_arr.tolist(),
                sibling_pos.tolist(),
                tags,
                no_classes.tolist(),
                id_len.tolist(),
                class_len.tolist(),
                no_children.tolist(),
                text_len.tolist(),
                class_text,
                id_text,
            )
        )
        anc_idx = np.full((len(kept), height), -1, dtype=np.int64)
        for row, i in enumerate(kept):
            a = parent[i]
            for h in range(height):
                if a < 0:
                    break
                anc_idx[row, h] = a
                a = parent[a]
        for h in range(height):
            col_rows = [
                local_rows[a] if (a := anc_idx[row, h]) >= 0 else _EMPTY_LOCAL
                for row in range(len(kept))
            ]
            pre = f"ancestor{h + 1}_"
            for k, name in enumerate(LOCAL_COLUMNS):
                vals = [r[k] for r in col_rows]
                if name in ("tag", "class_text", "id_text"):
                    data[pre + name] = vals
                else:
                    data[pre + name] = np.asarray(vals, dtype=np.int64)

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
