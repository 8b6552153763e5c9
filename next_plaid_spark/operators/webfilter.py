"""URL/domain filtering — the first stage of every web-corpus pipeline
(RefinedWeb §3.1 "URL filtering"; CCNet's source-level gates): normalize
URLs, drop blocklisted domains (with subdomain suffix semantics), and
dedup pages by canonical URL before any content ever gets tokenized.

Everything is Catalyst expressions — no UDFs, no driver state. The
blocklist join is the scale-critical shape: a URL's domain has ≤ a dozen
label suffixes, so suffix matching ("bad.com" blocks "a.b.bad.com")
explodes each doc to its suffix chain and equi-joins the (small,
broadcast) blocklist — never a LIKE scan over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from next_plaid_spark.session import local_df


def normalize_url(col: Column) -> Column:
    """Canonical form: lowercase, scheme/www./fragment stripped, trailing
    slash dropped — the equality key for URL dedup."""
    u = F.lower(F.trim(col))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    return F.regexp_replace(u, r"/+$", "")


def domain_of(col: Column) -> Column:
    """Registered host of a (normalized or raw) URL: the part before the
    first '/', '?' or ':' — ports and paths dropped."""
    return F.regexp_extract(normalize_url(col), r"^([^/:?]+)", 1)


def _suffixes(domain: Column) -> Column:
    """All dot-suffix chains of a host: a.b.c → [a.b.c, b.c, c]."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def filter_by_domain_blocklist(docs: DataFrame, blocklist, *,
                               url_col: str = "url") -> DataFrame:
    """Drop docs whose domain IS or IS UNDER a blocklisted domain.

    ``blocklist``: list[str] or a one-column DataFrame of domains.
    Suffix semantics: "bad.com" blocks "bad.com" and "sub.bad.com" but
    NOT "notbad.com" (label-boundary exact match on the suffix chain).
    Plan: explode each doc's ≤~10 suffix labels, left-anti equi-join the
    broadcast blocklist — corpus scanned once, never shuffled."""
    spark = docs.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = local_df(
            spark, [(d,) for d in blocklist], "_bad string")
    bad = blocklist.select(
        F.lower(F.trim(F.col(blocklist.columns[0]))).alias("_bad")
    )
    hit = (
        docs.select(
            F.col(url_col),
            F.explode(_suffixes(domain_of(F.col(url_col)))).alias("_sfx"),
        )
        .join(F.broadcast(bad), F.col("_sfx") == F.col("_bad"), "left_semi")
        .select(url_col)
        .distinct()
    )
    return docs.join(hit, url_col, "left_anti")


def dedup_by_url(docs: DataFrame, *, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """One page per canonical URL, lowest id wins (deterministic — the
    curation suite's first-arrival discipline)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("_canon").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("_canon", normalize_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_canon")
    )
