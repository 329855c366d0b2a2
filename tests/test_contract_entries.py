"""CI guard for the round-5 pure-SQL contract entries.

The driver's correctness gate (and `scripts/check_contract.py`) compares
every `__spark_entry__.queries()` entry against its DuckDB oracle at
sf0.01; this test pins the cheap non-index entries at sf0.001 so a
regression in an entry OR its oracle fails pytest without waiting for the
driver round. The index-backed entries (ft_*) are excluded here — their
engine paths are already covered by the rank-identity/build/delete suites,
and building an index per test run at this layer would duplicate those.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ENTRIES = [
    "containment_join_chunks_docs",
    "refops_dates",
    "latest_flag",
    "report_link_scan",
    "report_pdf_links",
    "refops_escape_parse",
    "eval_retrieval_pipeline",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "part.parquet")),
    reason="driver testdata not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("part", "orders", "documents"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_matches_oracle(spark, duck, name):
    import __spark_entry__ as E
    from check_contract import normalize

    got = normalize(E.queries()[name](spark, SF_DIR).toPandas())
    want = normalize(duck.execute(E.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind in "iu" and b.dtype.kind in "iu":
            a, b = a.astype("int64"), b.astype("int64")
        assert a.dtype.kind not in "iu" or b.dtype.kind in "iu", c
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np

            assert np.allclose(
                a.astype(float).to_numpy(),
                b.astype(float).to_numpy(),
                atol=0,
                rtol=1e-9,
                equal_nan=True,
            ), c
        else:
            assert a.astype(str).equals(b.astype(str)), c
