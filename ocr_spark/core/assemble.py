"""Ordered text assembly — content blocks -> final document text.

Reference analog: right-to-left reassembly ``''.join(letters[::-1])``
(/root/reference/ocr_project/ocr_app/services/func.py:58) and per-line
append order (func.py:206-211). Here reading order is document order of
content blocks; the join separator is a fixed "\n\n" so output bytes are
fully pinned.
"""

from __future__ import annotations

from ocr_spark.core.blocks import Block

BLOCK_SEPARATOR = "\n\n"


def assemble(blocks: list[Block]) -> str:
    """Concatenate content blocks in document order."""
    return BLOCK_SEPARATOR.join(b.text for b in blocks if b.is_content)
