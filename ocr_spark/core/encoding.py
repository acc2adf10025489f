"""Canonical byte -> str decoding policy.

One fixed, total, deterministic decoder used by both the oracle and the
Spark UDF so extracted text is byte-identical per url regardless of where
it runs (reference analog: grayscale/Otsu normalization at the scan,
/root/reference/hebrew-letter-segmentation.py:19-33 — a pure projection
applied before any segmentation).

Policy (first match wins):
  1. empty bytes            -> ("", "empty")
  2. UTF-8 / UTF-16 BOM     -> that encoding (BOM stripped)
  3. <meta charset=...> or <meta http-equiv content="...charset=..."> in the
     first 2048 bytes (ASCII scan)   -> declared encoding if codec known
  4. strict UTF-8 decode succeeds    -> utf-8
  5. latin-1 (total — never fails)   -> latin-1

Decode errors inside a declared charset fall through to steps 4/5 so the
function is total: it never raises.
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]{1,32})""",
    re.IGNORECASE,
)

# Aliases normalized to codec names Python ships. Anything else -> ignored.
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin1": "latin-1",
    "latin-1": "latin-1",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "gbk": "gbk",
    "gb2312": "gbk",
    "big5": "big5",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc_jp",
    "koi8-r": "koi8_r",
}


def sniff_declared_charset(data: bytes) -> str | None:
    """Return the normalized codec name declared in a <meta> tag, or None."""
    m = _META_CHARSET_RE.search(data[:2048])
    if not m:
        return None
    raw = m.group(1).decode("ascii", "replace").lower()
    return _CHARSET_ALIASES.get(raw)


def decode_bytes(data: bytes) -> tuple[str, str]:
    """Decode page bytes to text under the canonical policy.

    Returns (text, encoding_label). Total: never raises.
    """
    if not data:
        return "", "empty"
    if data.startswith(codecs.BOM_UTF8):
        try:
            return data[len(codecs.BOM_UTF8):].decode("utf-8"), "utf-8-bom"
        except UnicodeDecodeError:
            pass
    if data.startswith(codecs.BOM_UTF16_LE):
        try:
            return data[2:].decode("utf-16-le"), "utf-16-le"
        except UnicodeDecodeError:
            pass
    if data.startswith(codecs.BOM_UTF16_BE):
        try:
            return data[2:].decode("utf-16-be"), "utf-16-be"
        except UnicodeDecodeError:
            pass
    declared = sniff_declared_charset(data)
    if declared is not None:
        try:
            return data.decode(declared), declared
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return data.decode("latin-1"), "latin-1"
