"""Attribute span parsing — observable semantics of the reference's
in-place lazy attribute machinery (src/html/attr_inline.zig:35-103,
parseRawValue attr_inline.zig:304-334), WITHOUT the in-place mutation
tricks (NUL markers / skip metadata are an implementation detail we do
not replicate; we parse each element's attribute span once and cache).

Pinned behaviors (each has a test):
* attribute names are runs of ident chars ``[A-Za-z0-9_:.\\-]`` —
  matching is ASCII case-insensitive, first occurrence wins;
* a bare ``/`` or ``>`` at name position TERMINATES the scan — any
  attributes written after a stray ``/`` are invisible;
* ``name`` alone, ``name`` followed by whitespace, or explicit empty
  assignment ``name=`` all yield the empty-string value (boolean
  attribute ≡ ``""``, document.zig:1212-1231);
* ``name = v`` (spaces around ``=``) is NOT a valued attribute: it is
  boolean ``name`` plus boolean ``v`` (the reference reads the delim
  byte immediately after the name);
* quoted values run to the matching quote (or span end); naked values
  stop at whitespace, ``>`` or ``/`` (so ``href=http://x`` parses as
  ``"http:"`` — faithful to the reference);
* values are entity-decoded with the same subset as text.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .entities import decode_entities
from .htmlparse import Dom, ELEMENT

_WS_RE = re.compile(rb"[ \t\n\r\x0c]+")
_ATTRNAME_RE = re.compile(rb"[A-Za-z0-9_:.\-]+")
_NAKED_STOP_RE = re.compile(rb"[^>/ \t\n\r\x0c]+")


def _parse_raw_value(source: bytes, eq_index: int, end: int) -> Tuple[bytes, int]:
    """Value after ``=`` at ``eq_index``; returns (raw_value, next_pos)."""
    i = eq_index + 1
    m = _WS_RE.match(source, i, end)
    if m:
        i = m.end()
    if i >= end:
        return b"", i
    c = source[i]
    if c == 0x3E or c == 0x2F:  # '>' '/'
        return b"", i
    if c == 0x27 or c == 0x22:  # quote
        q = source.find(source[i:i + 1], i + 1, end)
        if q < 0:
            return source[i + 1:end], end
        return source[i + 1:q], q + 1
    m = _NAKED_STOP_RE.match(source, i, end)
    j = m.end() if m else i
    return source[i:j], j


def parse_attr_items(source: bytes, start: int, end: int) -> List[Tuple[bytes, bytes, bytes]]:
    """Scan one element's attribute span.

    Returns ``[(name_lower, decoded_value, raw_repr)]`` in document
    order, where ``raw_repr`` is the verbatim source slice for valued
    attributes (used by HTML serialization) or the original-case name
    for boolean attributes.
    """
    out: List[Tuple[bytes, bytes, bytes]] = []
    i = start
    while i < end:
        m = _WS_RE.match(source, i, end)
        if m:
            i = m.end()
        if i >= end:
            break
        c = source[i]
        if c == 0x3E or c == 0x2F:
            break
        m = _ATTRNAME_RE.match(source, i, end)
        if m is None:
            i += 1
            continue
        name_start = i
        i = m.end()
        name = source[name_start:i]
        if i >= end:
            out.append((name.lower(), b"", name))
            break
        d = source[i]
        if d == 0x3D:  # '='
            raw, nxt = _parse_raw_value(source, i, end)
            out.append((name.lower(), decode_entities(raw), source[name_start:nxt]))
            i = nxt
            continue
        out.append((name.lower(), b"", name))
        if d == 0x3E or d == 0x2F:
            break
        i += 1
    return out


def attrs_of(dom: Dom, idx: int) -> Dict[bytes, bytes]:
    """Decoded attribute map of element ``idx`` (first occurrence wins),
    parsed once and cached on the Dom."""
    cached = dom._attrs_cache.get(idx)
    if cached is not None:
        return cached
    d: Dict[bytes, bytes] = {}
    if dom.kind[idx] == ELEMENT:
        for name, value, _raw in parse_attr_items(dom.source, dom.end[idx], dom.attr_end[idx]):
            if name not in d:
                d[name] = value
    dom._attrs_cache[idx] = d
    return d


def get_attr(dom: Dom, idx: int, name: str) -> Optional[bytes]:
    """Decoded attribute value or None when absent (case-insensitive)."""
    return attrs_of(dom, idx).get(name.encode("utf-8").lower())
