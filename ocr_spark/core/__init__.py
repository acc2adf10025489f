"""Pure-Python extraction core.

This package has NO Spark dependency. The single-node oracle extractor and
the Spark pandas-UDF pipeline both call :func:`ocr_spark.core.extract.extract`
— identical code path, therefore byte-identical output per document
(SURVEY.md §7 "Architecture rule #1").
"""

from ocr_spark.core.extract import ExtractResult, extract  # noqa: F401
