"""HTML entity decoding — the reference's exact subset, nothing more.

Models reference src/html/entities.zig:75-136: only ``&amp; &lt; &gt;
&quot; &apos;`` (case-sensitive, trailing ``;`` required) plus numeric
``&#d;`` / ``&#xH;`` up to U+10FFFF are decoded.  Everything else —
including ``&nbsp;`` — passes through verbatim (pinned by the
reference's own tests, root.zig:181-216).  Invalid numerics (overflow,
surrogates, missing ``;``) are left untouched.
"""

from __future__ import annotations

import re

_NAMED = {
    b"amp": b"&",
    b"lt": b"<",
    b"gt": b">",
    b"quot": b'"',
    b"apos": b"'",
}

# Named subset is case-sensitive; numeric marker x/X both allowed.
_ENT_RE = re.compile(rb"&(?:(amp|lt|gt|quot|apos);|#([0-9]+);|#[xX]([0-9a-fA-F]+);)")


def _repl(m: "re.Match[bytes]") -> bytes:
    name = m.group(1)
    if name is not None:
        return _NAMED[name]
    dec = m.group(2)
    cp = int(dec) if dec is not None else int(m.group(3), 16)
    if cp > 0x10FFFF:
        return m.group(0)
    try:
        return chr(cp).encode("utf-8")
    except (UnicodeEncodeError, ValueError):
        # Surrogates U+D800..U+DFFF cannot be UTF-8 encoded → entity
        # stays raw, same as the reference's utf8Encode failure path.
        return m.group(0)


def decode_entities(data: bytes) -> bytes:
    """Decode the supported entity subset; fast no-op when no ``&``."""
    if b"&" not in data:
        return data
    return _ENT_RE.sub(_repl, data)
