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


def _write_node(dom: Dom, idx: int, out: List[bytes], self_only: bool,
                materialized: bool) -> None:
    k = dom.kind[idx]
    if k == TEXT:
        t = dom.text_bytes(idx)
        out.append(decode_entities(t) if materialized else t)
        return
    if k == DOCUMENT:
        _write_children(dom, idx, out, materialized)
        return
    name = dom.name_disp[idx]
    out.append(b"<")
    out.append(name)
    _write_attrs(dom, idx, out, materialized)
    out.append(b">")
    if self_only:
        return
    if dom.name_lower[idx] not in VOID_TAGS:
        _write_children(dom, idx, out, materialized)
        out.append(b"</")
        out.append(name)
        out.append(b">")


def _write_children(dom: Dom, parent_idx: int, out: List[bytes],
                    materialized: bool) -> None:
    end = dom.subtree_end[parent_idx]
    idx = parent_idx + 1
    n = len(dom.kind)
    while idx <= end and idx < n:
        if dom.parent[idx] != parent_idx:
            idx += 1
            continue
        _write_node(dom, idx, out, self_only=False, materialized=materialized)
        nxt = dom.subtree_end[idx] + 1
        idx = nxt if nxt > idx else idx + 1


def write_html(dom: Dom, idx: int, materialized: bool = False) -> bytes:
    """Serialize node ``idx`` and its subtree."""
    out: List[bytes] = []
    _write_node(dom, idx, out, self_only=False, materialized=materialized)
    return b"".join(out)


def write_html_self(dom: Dom, idx: int, materialized: bool = False) -> bytes:
    """Serialize the node's own tag only (children excluded)."""
    out: List[bytes] = []
    _write_node(dom, idx, out, self_only=True, materialized=materialized)
    return b"".join(out)
