"""HTML serialization of a parsed subtree (reference node.zig:174-375).

Serializes the *pristine* parse state: raw attributes are re-emitted
verbatim (original quoting preserved), boolean attributes as bare
names, void tags are left unclosed, text nodes are emitted undecoded.
(The reference's output additionally reflects any in-place decode that
queries performed on the shared mutable buffer; our DOM is immutable,
so output always corresponds to the reference's pre-materialization
state — the only state a fresh parse can observe.)
"""

from __future__ import annotations

from typing import List

from .attrs import parse_attr_items
from .htmlparse import Dom, DOCUMENT, ELEMENT, TEXT, VOID_TAGS


def _write_attrs(dom: Dom, idx: int, out: List[bytes]) -> None:
    for _name_l, _value, raw in parse_attr_items(dom.source, dom.end[idx], dom.attr_end[idx]):
        out.append(b" ")
        out.append(raw)


def _write_node(dom: Dom, idx: int, out: List[bytes], self_only: bool) -> None:
    k = dom.kind[idx]
    if k == TEXT:
        out.append(dom.text_bytes(idx))
        return
    if k == DOCUMENT:
        _write_children(dom, idx, out)
        return
    name = dom.name_disp[idx]
    out.append(b"<")
    out.append(name)
    _write_attrs(dom, idx, out)
    out.append(b">")
    if self_only:
        return
    if dom.name_lower[idx] not in VOID_TAGS:
        _write_children(dom, idx, out)
        out.append(b"</")
        out.append(name)
        out.append(b">")


def _write_children(dom: Dom, parent_idx: int, out: List[bytes]) -> None:
    end = dom.subtree_end[parent_idx]
    idx = parent_idx + 1
    n = len(dom.kind)
    while idx <= end and idx < n:
        if dom.parent[idx] != parent_idx:
            idx += 1
            continue
        _write_node(dom, idx, out, self_only=False)
        nxt = dom.subtree_end[idx] + 1
        idx = nxt if nxt > idx else idx + 1


def write_html(dom: Dom, idx: int) -> bytes:
    """Serialize node ``idx`` and its subtree."""
    out: List[bytes] = []
    _write_node(dom, idx, out, self_only=False)
    return b"".join(out)


def write_html_self(dom: Dom, idx: int) -> bytes:
    """Serialize the node's own tag only (children excluded)."""
    out: List[bytes] = []
    _write_node(dom, idx, out, self_only=True)
    return b"".join(out)
