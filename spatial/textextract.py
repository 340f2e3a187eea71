"""Deterministic HTML -> text extraction.

BASELINE.json input_hint pins the per-row invariant: **byte-identical
extracted text per url** across reruns, resumes, and parallelism levels. That
means the extraction must be a pure function of the html bytes with no
locale, environment, or ordering dependence. The implementation below is
golden-pinned by tests/test_pipeline.py and must not drift.

Pipeline (all steps pure, in fixed order):
1. decode UTF-8 with errors="replace" (deterministic replacement char),
2. drop <script>/<style>/<!-- --> blocks (non-greedy, case-insensitive),
3. replace every remaining tag with a single space,
4. decode HTML entities (html.unescape -- a pure table lookup),
5. whitespace-normalize: split on any whitespace run, join with one space
   (this also strips leading/trailing whitespace).

Exposed as a scalar pandas_udf (Arrow batches; the regexes are compiled once
per worker, and Python's regex engine runs per-row but allocation-free --
this is a bytes->str transform with no vectorizable arithmetic, the honest
Pandas-UDF case from SURVEY.md §2.1.6).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Pure deterministic HTML->text; the golden-pinned function."""
    if html_bytes is None:
        return None
    text = bytes(html_bytes).decode("utf-8", errors="replace")
    text = _SCRIPT_RE.sub(" ", text)
    text = _STYLE_RE.sub(" ", text)
    text = _COMMENT_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    text = _html.unescape(text)
    return " ".join(text.split())


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)
