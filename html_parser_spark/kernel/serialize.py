"""HTML serialization of a parsed subtree (reference node.zig:174-375).

Serializes the *pristine* parse state: raw attributes are re-emitted
verbatim (original quoting preserved), boolean attributes as bare
names, void tags are left unclosed, text nodes are emitted undecoded.
The reference's output additionally reflects any in-place decode that
queries performed on the shared mutable buffer (root.zig:106-145:
after reads, attrs re-emit as ``name="escaped"`` and text decodes).
Our DOM is immutable, so instead of statefulness both observable forms
are explicit: default = pristine parse; ``materialized=True`` =
post-query form for the whole subtree (decoded text, decoded
double-quoted attrs escaped per node.zig:388-397: ``& < "``).
"""

from __future__ import annotations

from typing import List

from .attrs import parse_attr_items
from .entities import decode_entities
from .htmlparse import Dom, DOCUMENT, ELEMENT, TEXT, VOID_TAGS


def _escape_attr(value: bytes) -> bytes:
    return (value.replace(b"&", b"&amp;")
                 .replace(b"<", b"&lt;")
                 .replace(b'"', b"&quot;"))


def _write_attrs(dom: Dom, idx: int, out: List[bytes], materialized: bool) -> None:
    for _name_l, value, raw in parse_attr_items(dom.source, dom.end[idx], dom.attr_end[idx]):
        out.append(b" ")
        if not materialized:
            out.append(raw)
            continue
        name = raw.split(b"=", 1)[0]
        if b"=" in raw:
            out.append(name + b'="' + _escape_attr(value) + b'"')
        else:
            out.append(name)  # boolean attr stays bare


def _write_open_tag(dom: Dom, idx: int, out: List[bytes],
                    materialized: bool) -> None:
    out.append(b"<")
    out.append(dom.name_disp[idx])
    _write_attrs(dom, idx, out, materialized)
    out.append(b">")


def write_html(dom: Dom, idx: int, materialized: bool = False) -> bytes:
    """Serialize node ``idx`` and its subtree.

    ITERATIVE over the preorder node array (the subtree is the
    contiguous interval ``[idx, subtree_end[idx]]``; close tags emit
    when the walk passes a node's ``subtree_end``) — a 100k-deep
    pathological nesting serializes in one loop instead of 100k Python
    frames.  Behavior is byte-identical to the recursive form (the
    round-trip property suite pins it)."""
    out: List[bytes] = []
    end = dom.subtree_end[idx]
    n = len(dom.kind)
    closers: List[tuple] = []  # (subtree_end, display name)
    i = idx
    while i <= end and i < n:
        while closers and closers[-1][0] < i:
            out.append(b"</" + closers.pop()[1] + b">")
        k = dom.kind[i]
        if k == TEXT:
            t = dom.text_bytes(i)
            out.append(decode_entities(t) if materialized else t)
        elif k == ELEMENT:
            _write_open_tag(dom, i, out, materialized)
            if dom.name_lower[i] not in VOID_TAGS:
                closers.append((dom.subtree_end[i], dom.name_disp[i]))
        # DOCUMENT emits nothing: its children serialize bare
        i += 1
    while closers:
        out.append(b"</" + closers.pop()[1] + b">")
    return b"".join(out)


def write_html_self(dom: Dom, idx: int, materialized: bool = False) -> bytes:
    """Serialize the node's own tag only (children excluded)."""
    out: List[bytes] = []
    k = dom.kind[idx]
    if k == TEXT:
        t = dom.text_bytes(idx)
        out.append(decode_entities(t) if materialized else t)
    elif k == ELEMENT:
        _write_open_tag(dom, idx, out, materialized)
    return b"".join(out)
