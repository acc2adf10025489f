"""Minimal PDF content-stream text extractor with reading-order rules.

From-scratch (no pypdf in the environment). Scope is the generated-PDF
subset pinned in FIXTURES.md: xref-less object scan, FlateDecode streams,
text operators BT/ET, Tf, TL, Td/TD/Tm/T*, Tj/TJ/'/".

Reading-order rule (fixed; the analog of RTL ordering + line-offset
rebasing, /root/reference/utils.py:175 and
/root/reference/hebrew-letter-segmentation.py:164-166):
  1. cluster text segments into columns by x-bands (new band when the gap
     between sorted segment x-origins exceeds BAND_GAP);
  2. bands ordered left-to-right;
  3. within a band, lines ordered top-to-bottom (y descending, PDF y axis
     points up), segments within a line left-to-right, joined by a space;
  4. lines joined by "\n", bands joined by "\n\n".

Total: any structural surprise yields "" (never raises) — mirroring the
reference's whole-image fallback when no peaks are found
(/root/reference/utils.py:84-87).
"""

from __future__ import annotations

import re
import zlib

from ocr_spark.core.blocks import normalize_ws

PDF_MAGIC = b"%PDF-"
BAND_GAP = 150.0
LINE_Y_DECIMALS = 2

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s/<>\[\]()]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def is_pdf(data: bytes) -> bool:
    return data.startswith(PDF_MAGIC)


def _decode_pdf_string(raw: bytes) -> str:
    """Literal string body (inside parens) -> str. Latin-1 byte semantics."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits.append(chr(raw[j]))
                    j += 1
                out.append(chr(int("".join(oct_digits), 8) & 0xFF))
                i = j
                continue
            if nxt == 0x0A:  # line continuation
                i += 2
                continue
            i += 1  # lone backslash: dropped
            continue
        out.append(chr(b))
        i += 1
    return "".join(out)


def _tokenize_content(data: bytes):
    """Yield ('str', s) | ('num', f) | ('name', n) | ('op', o) | ('arr', ...)."""
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b in b" \t\r\n\0\x0c":
            i += 1
            continue
        if b == 0x28:  # '(' literal string, paren nesting + escapes
            depth = 1
            j = i + 1
            start = j
            while j < n and depth > 0:
                c = data[j]
                if c == 0x5C:
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                j += 1
            yield ("str", _decode_pdf_string(data[start : j - 1]))
            i = j
            continue
        if b == 0x3C and i + 1 < n and data[i + 1] == 0x3C:  # '<<' dict
            i += 2
            continue
        if b == 0x3E and i + 1 < n and data[i + 1] == 0x3E:  # '>>'
            i += 2
            continue
        if b == 0x3C:  # '<hex string>'
            j = data.find(b">", i + 1)
            if j < 0:
                break
            hexs = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                yield ("str", bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
            except ValueError:
                pass
            i = j + 1
            continue
        if b in b"[]":
            yield ("arr", chr(b))
            i += 1
            continue
        if b == 0x2F:  # name
            m = _NAME_RE.match(data, i)
            yield ("name", m.group(0).decode("latin-1"))
            i = m.end()
            continue
        m = _NUM_RE.match(data, i)
        if m:
            yield ("num", float(m.group(0)))
            i = m.end()
            continue
        m = _OP_RE.match(data, i)
        if m:
            yield ("op", m.group(0).decode("latin-1"))
            i = m.end()
            continue
        i += 1  # unknown byte: skip (total)


def _extract_segments(content: bytes) -> list[tuple[float, float, str]]:
    """Interpret text operators -> [(x, y, text)] segments."""
    segs: list[tuple[float, float, str]] = []
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    operands: list = []

    for kind, val in _tokenize_content(content):
        if kind in ("str", "num", "name", "arr"):
            operands.append((kind, val))
            continue
        op = val
        nums = [v for k, v in operands if k == "num"]
        strs = [v for k, v in operands if k == "str"]
        if op == "BT":
            x = y = line_x = line_y = 0.0
        elif op == "Tm" and len(nums) >= 6:
            line_x, line_y = nums[-2], nums[-1]
            x, y = line_x, line_y
        elif op == "Td" and len(nums) >= 2:
            line_x += nums[-2]
            line_y += nums[-1]
            x, y = line_x, line_y
        elif op == "TD" and len(nums) >= 2:
            leading = -nums[-1]
            line_x += nums[-2]
            line_y += nums[-1]
            x, y = line_x, line_y
        elif op == "TL" and nums:
            leading = nums[-1]
        elif op == "T*":
            line_y -= leading
            x, y = line_x, line_y
        elif op == "Tj":
            if strs and strs[-1]:
                segs.append((x, y, strs[-1]))
        elif op == "TJ":
            text = "".join(strs)
            if text:
                segs.append((x, y, text))
        elif op == "'":
            line_y -= leading
            x, y = line_x, line_y
            if strs and strs[-1]:
                segs.append((x, y, strs[-1]))
        elif op == '"':
            line_y -= leading
            x, y = line_x, line_y
            if strs and strs[-1]:
                segs.append((x, y, strs[-1]))
        operands = []
    return segs


def _assemble_segments(segs: list[tuple[float, float, str]]) -> str:
    """Apply the fixed reading-order rule (module docstring)."""
    if not segs:
        return ""
    ordered = sorted(segs, key=lambda s: (s[0], -s[1]))
    bands: list[list[tuple[float, float, str]]] = [[ordered[0]]]
    last_x = ordered[0][0]
    for seg in ordered[1:]:
        if seg[0] - last_x > BAND_GAP:
            bands.append([])
        bands[-1].append(seg)
        last_x = seg[0]

    band_texts: list[str] = []
    for band in bands:
        lines: dict[float, list[tuple[float, str]]] = {}
        for sx, sy, stext in band:
            lines.setdefault(round(sy, LINE_Y_DECIMALS), []).append((sx, stext))
        line_texts = []
        for yk in sorted(lines, reverse=True):
            parts = [t for _, t in sorted(lines[yk], key=lambda p: p[0])]
            line = normalize_ws(" ".join(parts))
            if line:
                line_texts.append(line)
        if line_texts:
            band_texts.append("\n".join(line_texts))
    return "\n\n".join(band_texts)


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> extracted text under the fixed reading-order rule."""
    try:
        segs: list[tuple[float, float, str]] = []
        for m in _STREAM_RE.finditer(data):
            obj_dict, body = m.group(1), m.group(2)
            # stream bodies end with EOL before 'endstream'
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
            if b"/FlateDecode" in obj_dict:
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    continue
            if b"BT" not in body:
                continue
            segs.extend(_extract_segments(body))
        return _assemble_segments(segs)
    except Exception:
        return ""
