"""Latest-version maintenance — the reference's two-store "latest" model
re-expressed as a flag column + joins (SURVEY.md §2.3 J2-J4, §2.6 SO4).

Reference mechanics being replaced:
- two FAISS stores (all vs latest) selected per query (cloud_llm.py:110-149)
  → one table with a ``latest`` boolean; queries filter/partition-prune
- fuzzy new-supersedes-old matching (latest_updates.py:24-52: fuzz.ratio>75)
  → prefix-blocked theta join (the reference itself blocks on a 60-char
  prefix at latest_updates.py:85), fuzzy only within block
- substring containment join chunk↔doc (latest_updates.py:97-111)
  → normalized 60-char-prefix equi join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from statschat_ke_spark.functions.refops import fuzz_ratio_udf

PREFIX = 60
FUZZ_THRESHOLD = 75.0


def flag_latest(docs: DataFrame, series_col: str = "title", date_col: str = "release_date") -> DataFrame:
    """latest = max(date) within a title-series (window, no self-join)."""
    w = W.partitionBy(series_col)
    # coalesce: a NULL release_date compares NULL to the window max, and
    # three-valued logic would leak into the flag — filter(~latest) and
    # filter(latest) would BOTH drop such rows. An undated doc is not latest.
    return docs.withColumn(
        "latest",
        F.coalesce(F.col(date_col) == F.max(date_col).over(w), F.lit(False)),
    )


def match_superseded(new_docs: DataFrame, old_docs: DataFrame,
                     name_col: str = "title",
                     metric: str = "indel") -> DataFrame:
    """J3 — which old docs does each new doc supersede?

    Equi-block on the series stem — the first 3 title tokens (versions of a
    series share the stem and differ in trailing month/quarter/year) — then
    a fuzzy theta predicate within the block: the scale-safe version of the
    reference's full cross product (latest_updates.py:24-52; the reference's
    own blocking idea is the 60-char prefix at :85, which fails on titles
    shorter than 60 chars). Returns (new_name, old_name, similarity).

    ``metric``:
    - ``indel`` (default) — rapidfuzz-style ratio, reference parity
      (latest_updates.py:46), Arrow-vectorized UDF.
    - ``levenshtein`` — 100·(1 − lev/max(len)), pure JVM expression
      (``F.levenshtein`` inside whole-stage codegen; also expressible in
      ANSI SQL, which the contract oracle exploits).
    """

    def key(c: str) -> F.Column:
        toks = F.filter(F.split(F.lower(F.col(c)), "[^a-z0-9]+"), lambda x: x != "")
        return F.array_join(F.slice(toks, 1, 3), " ")
    n = new_docs.select(F.col(name_col).alias("new_name")).distinct().withColumn(
        "_blk", key("new_name")
    )
    o = old_docs.select(F.col(name_col).alias("old_name")).distinct().withColumn(
        "_blk", key("old_name")
    )
    if metric == "indel":
        sim = fuzz_ratio_udf(F.col("new_name"), F.col("old_name"))
    elif metric == "levenshtein":
        sim = F.round(
            100.0
            * (
                1.0
                - F.levenshtein("new_name", "old_name")
                / F.greatest(F.length("new_name"), F.length("old_name"))
            ),
            6,
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return (
        o.join(F.broadcast(n), "_blk")
        .withColumn("similarity", sim)
        .filter(F.col("similarity") > FUZZ_THRESHOLD)
        .select("new_name", "old_name", "similarity")
    )


def containment_join(chunks: DataFrame, docs: DataFrame,
                     source_col: str = "source",
                     name_col: str = "title",
                     prefix: int = PREFIX) -> DataFrame:
    """J4 — chunk↔doc substring containment join (latest_updates.py:97-111:
    ``doc[:60] in metadata["source"]``), scale-safe two-path plan:

    1. fast path: equi join on the ``prefix``-char key — covers every match
       where the chunk source STARTS with the doc-name prefix (the layout
       the reference produces: source = name-derived id);
    2. fallback: doc names not matched by the equi path (a left-anti
       residual, tiny by construction) broadcast into a contains() theta
       join, preserving the reference's contains-anywhere semantics for
       names the layout assumption misses. (A name already matched by
       prefix is assumed to have no ADDITIONAL mid-string matches — true
       for the reference's name-derived source ids; a full anywhere-join
       would be the all-pairs product this operator exists to avoid.)

    Returns (source, title) match pairs, deduplicated.
    """
    c = chunks.select(F.col(source_col).alias("source")).distinct()
    d = docs.select(F.col(name_col).alias("title")).distinct().withColumn(
        "_pfx", F.substring("title", 1, prefix)
    )
    eq = (
        c.withColumn("_pfx", F.substring("source", 1, prefix))
        .join(d, "_pfx")
        .select("source", "title")
    )
    unmatched = d.join(eq.select("title"), "title", "left_anti")
    theta = (
        c.crossJoin(F.broadcast(unmatched))
        .filter(F.col("source").contains(F.col("_pfx")))
        .select("source", "title")
    )
    return eq.unionByName(theta).dropDuplicates(["source", "title"])


def apply_update(base: DataFrame, delta: DataFrame,
                 key_col: str = "url",
                 series_col: str = "title",
                 date_col: str = "release_date") -> DataFrame:
    """SO4/J2 — merge a delta batch into the base corpus and re-flag latest.

    anti-join (keep base rows not replaced by the delta, J2 semantics of
    pdf_downloader.py:133-152) → unionByName → window re-flag. With Iceberg
    this is MERGE INTO + snapshot commit; on plain parquet it is a rewrite.
    """
    kept = base.join(delta.select(key_col), key_col, "left_anti")
    merged = kept.unionByName(delta.select(*kept.columns))
    return flag_latest(merged, series_col, date_col)
