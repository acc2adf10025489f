from __future__ import annotations

from ocr_spark.core.encoding import decode_bytes, sniff_declared_charset
from ocr_spark.core.pdf import extract_pdf_text, is_pdf
from ocr_spark.synth import make_pdf


def test_decode_empty():
    assert decode_bytes(b"") == ("", "empty")


def test_decode_utf8():
    assert decode_bytes("héllo".encode("utf-8")) == ("héllo", "utf-8")


def test_decode_bom():
    text, enc = decode_bytes(b"\xef\xbb\xbfhi")
    assert (text, enc) == ("hi", "utf-8-bom")


def test_decode_meta_charset():
    data = b"<html><head><meta charset=iso-8859-1></head><body>caf\xe9</body>"
    text, enc = decode_bytes(data)
    assert enc == "latin-1"
    assert "caf\xe9" in text


def test_decode_meta_http_equiv():
    data = (b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1252">caf\xe9')
    assert sniff_declared_charset(data) == "cp1252"


def test_decode_fallback_latin1():
    text, enc = decode_bytes(b"\xff\xfa\x80")
    assert enc == "latin-1"
    assert len(text) == 3


def test_is_pdf():
    assert is_pdf(b"%PDF-1.4\n")
    assert not is_pdf(b"<html>")


def test_pdf_single_column_lines():
    pdf = make_pdf(["line one", "line two", "line three"])
    assert extract_pdf_text(pdf) == "line one\nline two\nline three"


def test_pdf_two_column_band_order():
    pdf = make_pdf(["a1", "a2", "b1", "b2"], two_column=True)
    assert extract_pdf_text(pdf) == "a1\na2\n\nb1\nb2"


def test_pdf_escapes():
    pdf = make_pdf([r"parens (x) and \ backslash"])
    assert extract_pdf_text(pdf) == r"parens (x) and \ backslash"


def test_pdf_garbage_total():
    assert extract_pdf_text(b"%PDF-1.4 garbage") == ""
    assert extract_pdf_text(b"%PDF-" + bytes(range(256)) * 10) == ""
