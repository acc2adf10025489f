from __future__ import annotations

from ocr_spark.core.extract import extract
from ocr_spark.synth import make_golden, make_pages


def test_empty_and_none():
    assert extract(None).kind == "empty"
    assert extract(b"").kind == "empty"
    assert extract(b"  \n ").text == ""


def test_boilerplate_stripped():
    html = (b"<html><body><nav><a href='/'>home</a><a href='/a'>about</a></nav>"
            b"<p>" + b" ".join(b"word%d" % i for i in range(25)) + b"</p>"
            b"<footer>copyright</footer></body></html>")
    r = extract(html)
    assert "home" not in r.text
    assert "copyright" not in r.text
    assert "word0" in r.text


def test_linkfarm_yields_little():
    links = "".join(f'<li><a href="/{i}">link text {i} here</a></li>'
                    for i in range(40))
    r = extract(f"<html><body><ul>{links}</ul></body></html>".encode())
    assert r.text == ""


def test_determinism_over_corpus():
    pages = make_pages(150, seed=7)
    g1 = make_golden(pages)
    g2 = make_golden(pages)
    assert all(a["expected_text"] == b["expected_text"]
               for a, b in zip(g1, g2))


def test_corpus_nontrivial():
    pages = make_pages(150, seed=42)
    golden = make_golden(pages)
    nonempty = [g for g in golden if g["expected_text"]]
    assert len(nonempty) > len(golden) * 0.6
    kinds = {g["expected_kind"] for g in golden}
    assert {"html", "pdf", "empty"} <= kinds


def test_extract_total_on_adversarial():
    cases = [
        b"\x00\x01\x02",
        b"%PDF-not really",
        b"<p>" * 10000,
        "<p>Ünïcode ßtraße</p>".encode("utf-8"),
        "<meta charset=utf-8><p>declared</p>".encode("utf-16-le"),
        b"<script>" + b"x" * 100000,
    ]
    for c in cases:
        r = extract(c)
        assert isinstance(r.text, str)
