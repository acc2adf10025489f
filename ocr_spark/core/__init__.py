"""Pure-Python extraction core.

This package has NO Spark dependency. The single-node oracle extractor and
the Spark pandas-UDF pipeline both call :func:`ocr_spark.core.extract.extract`
— identical code path, therefore byte-identical output per document
(SURVEY.md §7 "Architecture rule #1").
"""

from ocr_spark.core.extract import ExtractResult, extract  # noqa: F401

_FP: str | None = None


def core_fingerprint() -> str:
    """12-hex content fingerprint of the extraction core: md5 over every
    ``.py`` file in this package, name-sorted. Any core change — however
    small — yields a new value; ``run_extract_job(reextract_stale=True)``
    compares it against the fingerprint stored in each bucket's done
    marker to decide which buckets an upgraded extractor must redo.
    Conservative by design: a comment-only edit re-extracts too — output
    byte-identity is the only safe equivalence, and that cannot be known
    without running. Computed once per process (the files are the ones
    already imported; they cannot change underneath a running job)."""
    global _FP
    if _FP is None:
        import hashlib
        from importlib import resources
        h = hashlib.md5()
        # importlib.resources traverses the package whether it lives in
        # a directory OR inside a --py-files zip (zipimport) — a plain
        # os.listdir(dirname(__file__)) breaks under the production
        # spark-submit deployment (pinned by test_submit)
        pkg = resources.files("ocr_spark.core")
        for entry in sorted(pkg.iterdir(), key=lambda e: e.name):
            if entry.name.endswith(".py"):
                h.update(entry.name.encode())
                h.update(entry.read_bytes())
        _FP = h.hexdigest()[:12]
    return _FP
