"""Pure-Python PDF/DOCX codecs (S6/S7 — reference app/main.py:216-223).

Round-trip (extract(make(t)) == t), operator coverage for content streams a
minimal writer does NOT emit (TJ arrays, hex strings, ', multi-stream
pages), and malformed-payload behavior.
"""

import random
import string
import zlib

import pytest

from lmss_entity_extractor_ray.sources.filetypes import (
    extract_docx,
    extract_pdf,
    make_docx,
    make_pdf,
)

CASES = [
    "",
    "hello world",
    "line1\nline2\nline3",
    "escapes (paren) and \\ backslash () nested ((deep))",
    "tab\there\nand\tmore",
    "\n\n",
    "trailing newline\n",
    "a" * 2000,
    "café résumé",
    "中文文本\n第二行",
]


class TestRoundTrip:
    @pytest.mark.parametrize("text", CASES)
    @pytest.mark.parametrize("compress", [False, True])
    def test_pdf(self, text, compress):
        assert extract_pdf(make_pdf(text, compress=compress)) == text

    @pytest.mark.parametrize("text", CASES)
    def test_docx(self, text):
        assert extract_docx(make_docx(text)) == text

    def test_pdf_multipage_concat(self):
        # page texts concatenate with NO separator (reference page-concat);
        # the inter-page newline is carried in the content stream
        text = "\n".join(f"line {i}" for i in range(10))
        payload = make_pdf(text, lines_per_page=3)
        assert payload.count(b"/Type /Page ") == 4
        assert extract_pdf(payload) == text

    def test_fuzz(self):
        rng = random.Random(13)
        alphabet = string.ascii_letters + string.digits + " ()\\\t\n<>[]/%"
        for _ in range(200):
            t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 300)))
            lpp = rng.choice([2, 7, 60])
            assert extract_pdf(make_pdf(t, compress=rng.random() < 0.5,
                                        lines_per_page=lpp)) == t, repr(t)
            assert extract_docx(make_docx(t)) == t, repr(t)


def _wrap_pdf(content: bytes, flate: bool = False) -> bytes:
    """A hand-rolled single-page PDF around an arbitrary content stream —
    exercises reader paths the minimal writer never emits."""
    if flate:
        content = zlib.compress(content)
        head = b"<< /Length %d /Filter /FlateDecode >>" % len(content)
    else:
        head = b"<< /Length %d >>" % len(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        head + b"\nstream\n" + content + b"\nendstream",
    ]
    out = [b"%PDF-1.4\n"]
    for i, o in enumerate(objs, start=1):
        out.append(b"%d 0 obj\n" % i + o + b"\nendobj\n")
    out.append(b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


class TestPdfOperators:
    def test_tj_array(self):
        # TJ shows array elements, skipping kerning numbers
        c = b"BT [(Hel) -20 (lo) 5 ( world)] TJ ET"
        assert extract_pdf(_wrap_pdf(c)) == "Hello world"

    def test_hex_strings(self):
        c = b"BT <48656C6C6F> Tj ET"
        assert extract_pdf(_wrap_pdf(c, flate=True)) == "Hello"

    def test_quote_operator_newline(self):
        # ' = move to next line + show
        c = b"BT 14 TL (first) Tj (second) ' ET"
        assert extract_pdf(_wrap_pdf(c)) == "first\nsecond"

    def test_td_newline_between_shows(self):
        c = b"BT 72 720 Td (a) Tj 0 -14 Td (b) Tj ET"
        assert extract_pdf(_wrap_pdf(c)) == "a\nb"

    def test_octal_and_escapes(self):
        c = b"BT (oct\\101 nl\\n tab\\t paren\\( bs\\\\) Tj ET"
        assert extract_pdf(_wrap_pdf(c)) == "octA nl\n tab\t paren( bs\\"

    def test_text_outside_bt_et_ignored(self):
        c = b"(not text) Tj BT (real) Tj ET"
        assert extract_pdf(_wrap_pdf(c)) == "real"

    def test_utf16_string(self):
        s = "café".encode("utf-16-be")
        c = b"BT <FEFF" + s.hex().upper().encode() + b"> Tj ET"
        assert extract_pdf(_wrap_pdf(c)) == "café"

    def test_binary_stream_containing_keywords(self):
        # Flate bytes may contain 'endobj'/'N 0 obj' patterns; /Length-driven
        # scan must not split objects there.  Craft by trying seeds until the
        # compressed bytes contain a hazard substring.
        base = b"BT (payload) Tj ET"
        for pad in range(200):
            c = base + b" % " + bytes([pad]) * 3
            comp = zlib.compress(c, 0)  # stored blocks: raw bytes visible
            if b"endobj" in comp or b" obj" in comp:
                break
        # stored-mode zlib keeps the literal text visible — guaranteed hazard
        c = base + b" % endobj 7 0 obj stream"
        payload = _wrap_pdf_raw_flate(c)
        assert extract_pdf(payload) == "payload"


def _wrap_pdf_raw_flate(content: bytes) -> bytes:
    comp = zlib.compress(content, 0)  # level 0: literal bytes inside stream
    assert b"endobj" in comp
    head = b"<< /Length %d /Filter /FlateDecode >>" % len(comp)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        head + b"\nstream\n" + comp + b"\nendstream",
    ]
    out = [b"%PDF-1.4\n"]
    for i, o in enumerate(objs, start=1):
        out.append(b"%d 0 obj\n" % i + o + b"\nendobj\n")
    out.append(b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


class TestDocxShapes:
    def test_tab_br_elements(self):
        # w:tab → \t and w:br → \n inside a run (python-docx Run.text)
        import io
        import zipfile

        w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        xml = (
            f'<w:document xmlns:w="{w}"><w:body><w:p><w:r>'
            "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
            "</w:r></w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", xml)
        assert extract_docx(buf.getvalue()) == "a\tb\nc"

    def test_empty_body(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(
                "word/document.xml",
                '<w:document xmlns:w="http://schemas.openxmlformats.org/'
                'wordprocessingml/2006/main"><w:body /></w:document>',
            )
        assert extract_docx(buf.getvalue()) == ""


class TestMalformed:
    @pytest.mark.parametrize("payload", [b"", b"not a pdf at all", b"%PDF-1.4\nnothing"])
    def test_pdf_raises(self, payload):
        with pytest.raises(Exception):
            extract_pdf(payload)

    @pytest.mark.parametrize("payload", [b"", b"PK\x03\x04 truncated zip"])
    def test_docx_raises(self, payload):
        with pytest.raises(Exception):
            extract_docx(payload)
