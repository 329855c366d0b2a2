"""Web-source operators: link extraction + crawl-frontier shaping.

Ports the reference's scrape loop (SURVEY.md §2.1 S1/S2, §2.2 P1/P2) from
imperative requests+regex (/root/reference/statschat/pdf_processing/
pdf_downloader.py:67-128) to column operators over an already-crawled
``html BINARY`` column — the Common-Crawl model from BASELINE.json
input_hint where fetching is upstream and the engine only parses.

All pure DataFrame/pandas-UDF; the network sink S3 (the actual GET) is out
of scope by design — pages arrive in the input table.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# value class must admit '#': an href like /reports/economic-survey#content
# would otherwise fail the WHOLE match (the class has to run to the closing
# quote) and be silently dropped — the reference's soup.find_all("a",
# href=True) extracts fragment-bearing hrefs and its /reports/ regex accepts
# them (no '/' in the fragment)
_HREF_RE = re.compile(rb"""<a\s[^>]*?href\s*=\s*["']([^"'>]+)["']""", re.IGNORECASE)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """S1/S2 — all <a href> targets per page, document order, raw.

    Vectorized over Arrow batches; bytes-level regex (no HTML parser in the
    container — the regex matches the reference's own approach,
    pdf_downloader.py:87-92)."""

    def links(b) -> list[str]:
        if b is None:
            return []
        out = []
        for m in _HREF_RE.finditer(bytes(b)):
            try:
                out.append(m.group(1).decode("utf-8", "replace"))
            except Exception:
                continue
        return out

    return html.map(links)


def report_links(pages: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """S1+P1+P2 — explode pages into candidate report links with the
    reference's predicate (rlike /reports/..., not census-prefixed,
    pdf_downloader.py:87-92) and order-preserving first-seen dedup
    (dict.fromkeys at :94 → row_number over first position)."""
    exploded = (
        pages.select(
            F.col(url_col).alias("page_url"),
            F.posexplode(extract_links_udf(F.col(html_col))).alias("pos", "href"),
        )
        .filter(
            F.col("href").rlike(r"/reports/[^/]+/?$")
            # exact reference prefix (pdf_downloader.py:92): the excluded
            # census pages live UNDER /reports/ — a bare /census prefix
            # could never match anything the rlike admits (dead filter)
            & ~F.col("href").startswith("https://www.knbs.or.ke/reports/kenya-census")
        )
    )
    from pyspark.sql import Window as W

    # first-seen = the reference's NUMERIC crawl order (page=1..n loop),
    # not lexicographic page_url (".../page/10/" sorts before ".../page/2/"
    # bytewise); listing pages without a /page/N/ component order as page 1
    page_no = F.coalesce(
        F.nullif(F.regexp_extract("page_url", r"/page/(\d+)", 1), F.lit("")).cast(
            "long"
        ),
        F.lit(1),
    )
    w = W.partitionBy("href").orderBy(page_no, "page_url", "pos")
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_pdf_link(links: Column) -> Column:
    """S2 — first href ending .pdf on a report page
    (pdf_downloader.py:105-127)."""
    pdfs = F.filter(links, lambda x: x.endswith(".pdf"))
    # try_element_at: ANSI mode (Spark 4 default) makes element_at throw on
    # an empty array; the reference returns None when a page has no pdf link
    return F.try_element_at(pdfs, F.lit(1))


def crawl_frontier(candidates: DataFrame, seen: DataFrame, key: str = "href") -> DataFrame:
    """J2 — UPDATE-mode anti-join: links not yet fetched
    (pdf_downloader.py:133-152)."""
    return candidates.join(seen.select(key), key, "left_anti")
