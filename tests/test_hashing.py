"""xxhash64 parity: pure-Python XXH64 == Spark F.xxhash64 (determinism core)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from statschat_ke_spark.functions.hashing import to_unsigned, xxh64, xxhash64_str

VECTORS = [
    "",
    "a",
    "hello",
    "inflation",
    "https://synth.example/economy/2023/x-000001.html#page=1",
    "x" * 7,
    "x" * 8,
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "über-ünïcode ✓",
]


def test_spark_parity(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    for v in VECTORS:
        assert xxhash64_str(v) == got[v], v


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxh64_range(data):
    h = xxh64(data)
    assert 0 <= h < 2**64


def test_to_unsigned():
    assert to_unsigned(-1) == 2**64 - 1
    assert to_unsigned(0) == 0
    assert to_unsigned(-(2**63)) == 2**63
