"""HTML → text extraction — vectorized pandas UDF with a frozen contract.

Reference semantics being matched (SURVEY.md §2.1 S5,
/root/reference/statschat/pdf_processing/pdf_to_json.py:239-269): per-page
text extraction that strips newlines (``text.replace("\\n", "")``), maps
empty results to ``""``, and is deterministic per source document. The
per-row invariant from BASELINE.json input_hint: extracted text must be
byte-identical per url to the golden ``text`` column.

Frozen extraction spec (engine-defined, HTML analog of the PDF extractor):
1. decode bytes as UTF-8 (errors="replace")
2. drop <script>…</script> and <style>…</style> blocks (case-insensitive)
3. drop all remaining tags ``<[^>]*>``
4. decode the five standard entities + &nbsp;
5. remove newlines (reference's replace), collapse whitespace runs to one
   space, strip ends; empty → ""
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def extract_text(html: bytes | str | None) -> str:
    """Pure single-value extractor — shared by the UDF and tests."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = s.replace("\n", "")  # reference normalization pdf_to_json.py:256
    s = _WS_RE.sub(" ", s).strip()
    return s


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html column → extracted text (Arrow-vectorized)."""
    return html.map(extract_text)
