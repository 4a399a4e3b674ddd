"""Pure-Python PDF and DOCX text extraction (reference upload seam,
app/main.py:216-220 PyPDF2 page-concat and app/main.py:221-223 python-docx
paragraph-join — SURVEY.md §2.1 S6/S7).

Those libraries are absent from this container, so the two formats are
re-implemented from the public file-format specs with the stdlib only:

* PDF (ISO 32000 subset): objects are scanned directly (``N G obj`` ..
  ``endobj``), the page tree is walked from the trailer's ``/Root`` through
  ``/Pages``/``/Kids`` so pages come out in document order, content streams
  are inflated when ``/FlateDecode``-compressed, and the text operators
  ``Tj``/``TJ``/``'``/``"`` inside ``BT``..``ET`` are decoded.  Matching the
  reference, page texts are CONCATENATED with no separator; line-move
  operators (``Td``/``TD``/``T*``/``'``) emit a newline, which is what
  PyPDF2's layout heuristic produces for the simple one-column documents
  ``make_pdf`` writes.
* DOCX (ECMA-376 WordprocessingML): the ``word/document.xml`` part of the
  zip container is parsed with ``xml.etree``; paragraph text is the
  concatenation of the direct ``w:r`` runs' ``w:t``/``w:tab``/``w:br``/
  ``w:cr`` children (python-docx ``paragraph.text`` semantics) and
  paragraphs join with ``"\\n"`` exactly as the reference does.

``make_pdf``/``make_docx`` are the matching writers: they produce real,
spec-conformant files (proper xref table, zip parts) used by the fixture
tests and by the dispatch query's payload synthesis, and both round-trip
``text`` exactly: ``extract_pdf(make_pdf(t)) == t`` and
``extract_docx(make_docx(t)) == t`` for any ``\\n``-structured text.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree as ET

# --------------------------------------------------------------------------
# DOCX
# --------------------------------------------------------------------------

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_W = "{%s}" % _W_NS

_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def make_docx(text: str) -> bytes:
    """A minimal real .docx: one paragraph per ``\\n``-separated line, each
    non-empty line a single run.  Tabs stay literal inside ``w:t``
    (``xml:space="preserve"`` keeps leading/trailing whitespace)."""
    body = ET.Element(_W + "body")
    for line in text.split("\n"):
        p = ET.SubElement(body, _W + "p")
        if line:
            r = ET.SubElement(p, _W + "r")
            t = ET.SubElement(r, _W + "t")
            t.set("{http://www.w3.org/XML/1998/namespace}space", "preserve")
            t.text = line
    doc = ET.Element(_W + "document")
    doc.append(body)
    xml = ET.tostring(doc, encoding="UTF-8", xml_declaration=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _DOCX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _DOCX_RELS)
        z.writestr("word/document.xml", xml)
    return buf.getvalue()


def _run_text(run: ET.Element) -> str:
    """python-docx ``Run.text``: ``w:t`` content plus ``w:tab`` → TAB and
    ``w:br``/``w:cr`` → NEWLINE, in document order."""
    parts: List[str] = []
    for child in run:
        tag = child.tag
        if tag == _W + "t":
            parts.append(child.text or "")
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag in (_W + "br", _W + "cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx(payload: bytes) -> str:
    """python-docx semantics per the reference (app/main.py:221-223):
    ``"\\n".join(paragraph.text for paragraph in Document(...).paragraphs)``
    where paragraphs are the body-level ``w:p`` elements."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find(_W + "body")
    if body is None:
        return ""
    paragraphs = []
    for p in body.iter(_W + "p"):
        paragraphs.append(
            "".join(_run_text(r) for r in p if r.tag == _W + "r")
        )
    return "\n".join(paragraphs)


# --------------------------------------------------------------------------
# PDF
# --------------------------------------------------------------------------


def _pdf_escape(line: str) -> bytes:
    b = line.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(text: str, compress: bool = False, lines_per_page: int = 60) -> bytes:
    """A minimal real PDF: Helvetica, one ``Tj`` per line with ``T*`` line
    moves, ``lines_per_page`` lines per page, proper xref + trailer.  With
    ``compress=True`` the content streams are ``/FlateDecode``-compressed.
    ``extract_pdf`` round-trips it exactly; PyPDF2 reads it identically for
    ASCII text (strings are written as UTF-8 bytes in literal strings, which
    any reader maps byte-per-char for the ASCII subset)."""
    lines = text.split("\n")
    pages = [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)]
    if not pages:
        pages = [[""]]

    objects: List[bytes] = []  # 1-indexed by position + 1

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_nums = []
    for pageno, page_lines in enumerate(pages):
        ops = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for i, line in enumerate(page_lines):
            if i:
                ops.append(b"T*")
            ops.append(b"(" + _pdf_escape(line) + b") Tj")
        if pageno < len(pages) - 1:
            # pages concatenate with NO separator on extraction (reference
            # semantics), so the newline that split the last line of this
            # page from the first line of the next is carried IN the
            # content — an explicit shown "\n" string
            ops.append(b"(\\n) Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_nums.append(
            add(head + b"\nstream\n" + stream + b"\nendstream")
        )
    # page objects reference the pages node, whose number we know in advance
    pages_num = len(objects) + len(pages) + 1
    page_nums = []
    for cnum in content_nums:
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
                % (pages_num, cnum, font_num)
            )
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    ) == pages_num
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(obj)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objects) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, xref_at)
    )
    return out.getvalue()


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _scan_objects(data: bytes) -> Dict[int, bytes]:
    """object number → raw object body (dict + optional stream).  A
    SEQUENTIAL walk, not a global regex: compressed stream bytes can contain
    ``endobj``/``N M obj`` patterns, so stream extents are jumped via the
    dict's direct ``/Length`` (falling back to an ``endstream`` search for
    indirect lengths) before looking for the real ``endobj``."""
    objs: Dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        body_start = m.end()
        d = _dict_of(data[body_start : body_start + 4096])
        search_from = body_start + data[body_start:].find(d) + len(d) if d else body_start
        # a stream belongs to THIS object only if it directly follows the
        # dict (whitespace-separated) — an unanchored search would catch the
        # next object's stream keyword
        sm = re.compile(rb"\s*stream\r?\n").match(data, search_from)
        if sm:
            lm = _LENGTH_RE.search(d)
            if lm:
                search_from = sm.end() + int(lm.group(1))
            else:
                es = data.find(b"endstream", sm.end())
                search_from = es if es >= 0 else sm.end()
        end = data.find(b"endobj", search_from)
        if end < 0:
            end = len(data)
        objs[int(m.group(1))] = data[body_start:end]
        pos = end
    return objs


def _dict_of(body: bytes) -> bytes:
    """The top-level ``<< .. >>`` dictionary bytes of an object body."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth, i = 0, start
    while i < len(body) - 1:
        pair = body[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _dict_value(d: bytes, key: bytes) -> Optional[bytes]:
    """The raw token(s) after ``/key`` in a dictionary (ref, number, name,
    or ``[..]`` array) — shallow, enough for the page-tree keys."""
    m = re.search(re.escape(b"/" + key) + rb"(?![A-Za-z0-9])", d)
    if not m:
        return None
    rest = d[m.end() :].lstrip()
    if rest.startswith(b"["):
        depth, i = 0, 0
        while i < len(rest):
            if rest[i : i + 1] == b"[":
                depth += 1
            elif rest[i : i + 1] == b"]":
                depth -= 1
                if depth == 0:
                    return rest[: i + 1]
            i += 1
        return rest
    m2 = re.match(rb"[^/\[\]<>]*", rest)
    return m2.group(0).strip() if m2 else None


def _stream_bytes(body: bytes) -> Optional[bytes]:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    lm = _LENGTH_RE.search(_dict_of(body))
    if lm:
        raw = body[m.end() : m.end() + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            end = len(body)
        raw = body[m.end() : end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
    if b"/FlateDecode" in _dict_of(body):
        raw = zlib.decompress(raw)
    return raw


def _page_order(objs: Dict[int, bytes], trailer_root: Optional[int]) -> List[int]:
    """Walk /Root → /Pages → /Kids recursively; fall back to every
    /Type /Page object in numeric order when the tree is broken."""
    catalog = trailer_root
    if catalog is None or catalog not in objs:
        catalog = next(
            (n for n, b in objs.items() if b"/Catalog" in _dict_of(b)), None
        )
    ordered: List[int] = []

    def walk(num: int, seen: set) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        d = _dict_of(objs[num])
        kids = _dict_value(d, b"Kids")
        if kids:
            for m in _REF_RE.finditer(kids):
                walk(int(m.group(1)), seen)
        elif b"/Page" in d:
            ordered.append(num)

    if catalog is not None:
        pages_tok = _dict_value(_dict_of(objs[catalog]), b"Pages")
        m = _REF_RE.search(pages_tok or b"")
        if m:
            walk(int(m.group(1)), set())
    if not ordered:
        ordered = sorted(
            n
            for n, b in objs.items()
            if b"/Page" in _dict_of(b) and b"/Pages" not in _dict_of(b)
        )
    return ordered


def _content_streams(objs: Dict[int, bytes], page_num: int) -> List[bytes]:
    d = _dict_of(objs[page_num])
    tok = _dict_value(d, b"Contents")
    if tok is None:
        return []
    out = []
    for m in _REF_RE.finditer(tok):
        body = objs.get(int(m.group(1)))
        if body is not None:
            s = _stream_bytes(body)
            if s is not None:
                out.append(s)
    return out


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _read_literal(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse ``(...)`` from ``data[i]`` (== '('), PDF escape + nesting rules;
    returns (decoded bytes, index past ')')."""
    assert data[i : i + 1] == b"("
    out, depth, i = bytearray(), 1, i + 1
    while i < len(data) and depth:
        c = data[i]
        if c == 0x5C and i + 1 < len(data):  # backslash
            n = data[i + 1]
            if n in _ESCAPES:
                out += _ESCAPES[n]
                i += 2
            elif 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(data) and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif data[i + 1 : i + 2] == b"\n":  # line continuation
                i += 2
            else:
                out.append(n)
                i += 2
        else:
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            out.append(c)
            i += 1
    return bytes(out), i


def _read_hex(data: bytes, i: int) -> Tuple[bytes, int]:
    end = data.find(b">", i + 1)
    if end < 0:
        end = len(data)
    hx = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


_NEWLINE_OPS = {b"T*", b"Td", b"TD"}
_TOKEN_RE = re.compile(rb"[^\s()<>\[\]/]+|/[^\s()<>\[\]/]*|\[|\]")


def _page_text(stream: bytes) -> str:
    """Text from one content stream: show-ops append their strings; line
    moves (``Td``/``TD``/``T*``/``'``/``"``) append a newline between
    shows — PyPDF2's output shape for simple one-column pages."""
    out: List[str] = []
    pending_nl = False
    strings_since_op: List[bytes] = []  # operands stack (strings only)
    i, n = 0, len(stream)
    in_text = False
    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == b"(":
            s, i = _read_literal(stream, i)
            strings_since_op.append(s)
            continue
        if c == b"<" and stream[i : i + 2] != b"<<":
            s, i = _read_hex(stream, i)
            strings_since_op.append(s)
            continue
        if stream[i : i + 2] in (b"<<", b">>"):
            i += 2
            continue
        m = _TOKEN_RE.match(stream, i)
        if not m:
            i += 1
            continue
        tok = m.group(0)
        i = m.end()
        if tok == b"BT":
            in_text = True
            pending_nl = False
            strings_since_op = []
        elif tok == b"ET":
            in_text = False
        elif not in_text:
            strings_since_op = []
        elif tok in (b"Tj", b"TJ"):
            if pending_nl and out:
                out.append("\n")
            pending_nl = False
            out.extend(_decode_pdf_string(s) for s in strings_since_op)
            strings_since_op = []
        elif tok == b"'":
            if out:
                out.append("\n")
            pending_nl = False
            out.extend(_decode_pdf_string(s) for s in strings_since_op)
            strings_since_op = []
        elif tok == b'"':
            if out:
                out.append("\n")
            pending_nl = False
            out.extend(_decode_pdf_string(s) for s in strings_since_op)
            strings_since_op = []
        elif tok in _NEWLINE_OPS:
            pending_nl = True
            strings_since_op = []
        elif tok in (b"Tf", b"TL", b"Tc", b"Tw", b"Tz", b"Ts", b"Tr", b"Tm"):
            strings_since_op = []
        elif tok == b"]" or tok == b"[":
            pass  # TJ arrays: keep collected strings
        elif tok[:1] not in b"+-.0123456789/":
            strings_since_op = []  # any other operator consumes operands
    return "".join(out)


def extract_pdf(payload: bytes) -> str:
    """Reference semantics (app/main.py:216-220): page texts concatenated
    with NO separator, pages in page-tree order."""
    objs = _scan_objects(payload)
    if not objs:
        raise ValueError("not a PDF: no objects found")
    root = None
    m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", payload)
    if m:
        root = int(m.group(1))
    parts = []
    for page in _page_order(objs, root):
        for stream in _content_streams(objs, page):
            parts.append(_page_text(stream))
    return "".join(parts)
