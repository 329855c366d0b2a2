"""Extraction byte-identity (BASELINE.json input_hint per-row invariant)
and the frozen tokenizer spec (FIXTURES.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from statschat_ke_spark.functions.extract import extract_text, extract_text_udf
from statschat_ke_spark.functions.tokenize import term_ids, tokenize
from statschat_ke_spark.functions.hashing import xxhash64_str


def test_extract_pure_matches_golden(corpus_pdf):
    """Generator composes text; extractor recovers it from html — byte-equal."""
    for row in corpus_pdf.itertuples(index=False):
        assert extract_text(row.html) == row.text


def test_extract_udf_matches_golden(spark, corpus_df):
    mismatches = (
        corpus_df.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extract_normalization():
    # reference semantics pdf_to_json.py:256-266: newline strip, empty→""
    assert extract_text(b"<p>a\nb</p>") == "ab"
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    assert extract_text(b"<script>x</script><p>hi</p>") == "hi"
    assert extract_text(b"<style>s{}</style>ok") == "ok"
    assert extract_text(b"a &amp; b &lt;c&gt;") == "a & b <c>"
    assert extract_text(b"  lots   of\tspace ") == "lots of space"


def test_tokenizer_spec():
    assert tokenize("Hello, World_9 x!") == ["hello", "world", "9", "x"]
    assert tokenize("") == []
    assert tokenize("ÜBER café") == ["ber", "caf"]  # ascii-only runs, frozen
    assert tokenize("a-b a_b") == ["a", "b", "a", "b"]


def test_term_ids_distinct_order_preserving():
    ids = term_ids(["b", "a", "b", "c", "a"])
    assert ids == [xxhash64_str("b"), xxhash64_str("a"), xxhash64_str("c")]
