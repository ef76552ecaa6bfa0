"""Minimal PDF text + layout extraction — pure stdlib, no PDF library.

The north rule's extraction pipeline covers "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; this module is the PDF leg.  Scope
is the text-bearing subset of PDF 1.4 that synthetic and simple
real-world documents use:

* objects located by scanning ``N G obj … endobj`` (no xref walk — the
  permissive posture of the HTML kernel applied to PDF: damaged xref
  tables are the PDF equivalent of unclosed tags); stream extents honor
  the dict's ``/Length`` when it lines up with an ``endstream``
  keyword, so compressed bodies containing the literal bytes
  ``endstream``/``endobj`` don't truncate (scan fallback otherwise);
* streams: raw or ``/FlateDecode`` (zlib — stdlib, a REAL codec path,
  unlike the multimodal image/audio stubs);
* text extraction from content streams: ``BT``/``ET`` blocks with
  ``Tf``/``Td``/``TD``/``Tm``/``T*`` cursor tracking and ``Tj``/``TJ``
  (kerning numbers ignored) show operators; PDF string escapes
  (``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r`` ``\\t`` ``\\ooo``) decoded;
* layout pass: runs are grouped into lines by quantized baseline y,
  lines ordered top-to-bottom (y descending — PDF y grows upward),
  runs within a line left-to-right by x; a column gap larger than
  ``column_gap`` starts a new segment so two-column pages read
  column-major like a human would.

A deterministic single-page generator (``synth_pdf``) produces the
test corpora; the DuckDB oracle reconstructs its expected text in
closed form, so extraction is value-checked end-to-end without any
external PDF dependency.
"""

from __future__ import annotations

import re
import zlib
from typing import List, NamedTuple, Optional, Tuple

_OBJ_START_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_BODY_RE = re.compile(rb"(.*?)\r?\nendstream", re.S)
_ENDSTREAM_AFTER_RE = re.compile(rb"\r?\n?endstream")
# direct integer /Length only — '/Length 3 0 R' is an indirect object
# REFERENCE whose number must not be mistaken for a byte length
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R\b)")
# text-showing + cursor operators inside BT/ET
_TOK_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"            # literal string
    rb"|\[|\]"
    rb"|-?\d+(?:\.\d+)?"
    rb"|BT|ET|Tj|TJ|Td|TD|Tm|T\*|Tf"
    rb"|/[A-Za-z0-9]+"
)
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.S)

_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESC_MAP.get(g, g)
    return _ESC_RE.sub(sub, raw)


class PdfRun(NamedTuple):
    y: float
    x: float
    text: str


class PdfExtract(NamedTuple):
    text: str
    lines: List[str]
    n_objects: int
    n_streams: int
    n_runs: int


def _iter_objects(data: bytes):
    """Yield ``(dict_part, stream_body | None)`` per ``N G obj`` object.

    A stream body is sliced by its dict's ``/Length`` when the entry
    parses as an integer AND the slice lands on an ``endstream``
    keyword (round-2 advice: a FlateDecode body containing the literal
    bytes ``endstream``/``endobj`` must not silently truncate the
    stream); only when ``/Length`` is absent or doesn't line up does
    the permissive scan to the first ``endstream`` apply.  The next
    object search resumes after the stream's real end, so byte
    sequences inside a length-delimited stream can't masquerade as
    object boundaries.  An unterminated stream runs to EOF — the PDF
    analog of the HTML kernel's unterminated-raw-text quirk.
    """
    pos = 0
    n = len(data)
    while pos < n:
        om = _OBJ_START_RE.search(data, pos)
        if om is None:
            return
        em = data.find(b"endobj", om.end())
        sm = _STREAM_START_RE.search(data, om.end())
        if sm is None or (em != -1 and em < sm.start()):
            # streamless object (or the next stream belongs to a later one)
            if em == -1:
                yield data[om.end():], None
                return
            yield data[om.end():em], None
            pos = em + len(b"endobj")
            continue
        dict_part = data[om.end():sm.start()]
        body_start = sm.end()
        body = None
        after = n
        lm = _LENGTH_RE.search(dict_part)
        if lm is not None:
            ln = int(lm.group(1))
            if body_start + ln <= n and _ENDSTREAM_AFTER_RE.match(data, body_start + ln):
                body = data[body_start:body_start + ln]
                after = body_start + ln
        if body is None:
            # Scan fallback, bounded by this object's own `endobj` (the
            # round-2 parser's behavior): an unterminated stream must
            # not swallow the next object's body wholesale.
            endpos = em if em != -1 else n
            bm = _STREAM_BODY_RE.match(data, body_start, endpos)
            if bm is not None:
                body = bm.group(1)
                after = bm.end()
            elif em != -1:
                # no endstream before endobj: streamless object, resume
                yield dict_part, None
                pos = em + len(b"endobj")
                continue
            else:
                # no endstream and no endobj: runs to EOF (permissive)
                yield dict_part, data[body_start:]
                return
        yield dict_part, body
        em2 = data.find(b"endobj", after)
        if em2 == -1:
            return
        pos = em2 + len(b"endobj")


#: decompression output cap — the deflate-bomb guard (deflate can
#: expand ~1000:1, so a 16 MB stream could otherwise demand ~16 GB and
#: OOM the executor; the analog of extraction's ``max_doc_bytes``
#: poison-pill truncation).  Beyond the cap the stream truncates and
#: the permissive contract continues with what decoded.
MAX_STREAM_BYTES = 64 * 1024 * 1024


def _decode_stream(dict_part: bytes, body: bytes,
                   max_bytes: int = MAX_STREAM_BYTES) -> Optional[bytes]:
    if b"/FlateDecode" in dict_part:
        # decompressobj tolerates truncated streams and trailing
        # garbage (returns the prefix that decoded) — the permissive
        # posture — and max_bytes caps the output regardless of the
        # declared ratio
        try:
            return zlib.decompressobj().decompress(body, max_bytes)
        except zlib.error:
            return None
    return body[:max_bytes]


def _decode_text(raw: bytes, encoding: str) -> str:
    """PDF literal strings carry bytes; decode per ``encoding``:

    * ``"auto"`` (default) — UTF-8 first, latin-1 fallback: correct for
      our generator (UTF-8) and for pure-ASCII real PDFs; a genuine
      latin-1 string whose bytes happen to form valid UTF-8 would be
      composed, so corpora known to be latin-1 should pass
      ``encoding="latin-1"`` explicitly (multi-byte characters split
      across two shows also need a fixed encoding);
    * any codec name — decoded with ``errors="replace"``, never raises.
    """
    if encoding == "auto":
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.decode("latin-1")
    return raw.decode(encoding, errors="replace")


def _runs_of_stream(data: bytes, encoding: str = "auto") -> List[PdfRun]:
    """Walk one content stream's text operators; returns show-runs with
    their device-space baseline positions.

    Cursor model: ``Tm`` sets (x, y) from its last two operands;
    ``Td``/``TD`` translate the LINE matrix (we track line start, and
    ``T*`` repeats the last ``TD`` leading, default 14); horizontal
    advance within a line is not modeled (run x = line-start x, which
    is enough for line assembly + left-to-right ordering of distinct
    columns)."""
    runs: List[PdfRun] = []
    in_text = False
    x = y = 0.0
    leading = 14.0
    stack_nums: List[float] = []
    pending: List[bytes] = []
    in_array = False
    for m in _TOK_RE.finditer(data):
        tok = m.group(0)
        if tok == b"BT":
            in_text, x, y = True, 0.0, 0.0
            stack_nums.clear()
            continue
        if tok == b"ET":
            in_text = False
            stack_nums.clear()
            continue
        if not in_text:
            continue
        if tok == b"[":
            in_array, pending = True, []
            continue
        if tok == b"]":
            in_array = False
            continue
        if tok.startswith(b"("):
            s = _unescape(tok[1:-1])
            if in_array:
                pending.append(s)
            else:
                pending = [s]
            continue
        if tok in (b"Tj", b"TJ"):
            raw = b"".join(pending)
            text = _decode_text(raw, encoding)
            # empty shows still mark a baseline: keep them so blank
            # lines survive (dropping them breaks line counting)
            runs.append(PdfRun(y, x, text))
            pending = []
            stack_nums.clear()
            continue
        if tok == b"Td":
            if len(stack_nums) >= 2:
                x += stack_nums[-2]
                y += stack_nums[-1]
            stack_nums.clear()
            continue
        if tok == b"TD":
            if len(stack_nums) >= 2:
                x += stack_nums[-2]
                y += stack_nums[-1]
                leading = -stack_nums[-1] if stack_nums[-1] != 0 else leading
            stack_nums.clear()
            continue
        if tok == b"Tm":
            if len(stack_nums) >= 6:
                x, y = stack_nums[-2], stack_nums[-1]
            stack_nums.clear()
            continue
        if tok == b"T*":
            y -= leading
            stack_nums.clear()
            continue
        if tok == b"Tf" or tok.startswith(b"/"):
            stack_nums.clear()
            continue
        # number operand (also TJ kerning values, ignored inside [])
        if not in_array:
            try:
                stack_nums.append(float(tok))
            except ValueError:
                pass
    return runs


def extract_pdf_text(data: bytes, y_quantum: float = 2.0,
                     column_gap: float = 150.0,
                     encoding: str = "auto") -> PdfExtract:
    """Extract layout-ordered text from a PDF byte payload.

    Never raises on malformed input (mirrors the HTML kernel's
    permissive contract): unparseable streams contribute nothing.
    """
    runs: List[PdfRun] = []
    n_objects = 0
    n_streams = 0
    for dict_part, body in _iter_objects(data):
        n_objects += 1
        if body is None:
            continue
        n_streams += 1
        decoded = _decode_stream(dict_part, body)
        if decoded is None or b"BT" not in decoded:
            continue
        runs.extend(_runs_of_stream(decoded, encoding))

    # ---- layout pass ----
    # column segmentation: sort run x positions; a gap > column_gap
    # splits reading order into column-major segments.
    def col_of(x: float, col_edges: List[float]) -> int:
        c = 0
        for e in col_edges:
            if x >= e:
                c += 1
        return c

    xs = sorted({r.x for r in runs})
    col_edges = [b for a, b in zip(xs, xs[1:]) if b - a > column_gap]
    keyed: List[Tuple[int, float, float, str]] = [
        (col_of(r.x, col_edges), -round(r.y / y_quantum), r.x, r.text) for r in runs
    ]
    keyed.sort(key=lambda k: (k[0], k[1], k[2]))
    lines: List[str] = []
    last_key: Optional[Tuple[int, float]] = None
    for col, ny, _x, text in keyed:
        if last_key == (col, ny):
            if text:  # empty run on an existing line adds no stray space
                lines[-1] = (lines[-1] + " " + text) if lines[-1] else text
        else:
            lines.append(text)
            last_key = (col, ny)
    return PdfExtract("\n".join(lines), lines, n_objects, n_streams, len(runs))


# ---------------------------------------------------------------------------
# deterministic generator (test/oracle corpus)
# ---------------------------------------------------------------------------

def _pdf_escape(data: bytes) -> bytes:
    return (data.replace(b"\\", rb"\\")
            .replace(b"(", rb"\(").replace(b")", rb"\)"))


def synth_pdf(lines: List[str], compress: bool = True,
              start_y: int = 720, leading: int = 14, x: int = 72) -> bytes:
    """One-page PDF showing ``lines`` top-to-bottom at ``x``.

    Emits a well-formed xref so external tools could read it, though
    the extractor never needs it."""
    ops = [b"BT", b"/F1 12 Tf", b"%d %d Td" % (x, start_y)]
    for i, ln in enumerate(lines):
        if i > 0:
            ops.append(b"0 %d Td" % (-leading))
        # UTF-8 bytes in the literal string: round-trips the full
        # unicode range (the extractor decodes UTF-8-first)
        ops.append(b"(" + _pdf_escape(ln.encode("utf-8")) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)
