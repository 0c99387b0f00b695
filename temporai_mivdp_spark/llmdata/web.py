"""Web-corpus URL operators: canonicalization, host/domain extraction,
URL-level dedup, per-domain caps.

Web crawls identify documents by URL before any text is compared, and
raw URLs are noisy duplicates of each other: scheme/case variants,
``www.`` prefixes, tracking query parameters, fragments, trailing
slashes. Canonicalizing first is the cheapest dedup a crawl pipeline
runs — it is pure row-local string work (zero shuffles), and every
downstream URL key (dedup groups, per-domain quotas, host statistics)
inherits its normalization.

Everything here is built-in expressions (``parse_url`` is JVM-side,
backed by Spark's UrlCodec): no UDFs, whole-stage-codegen friendly, and
portable to the DuckDB oracles via ``regexp_extract`` mirrors.

Scale shape: ``canonicalize_url`` / ``url_parts`` add no exchange to any
plan. ``url_duplicates`` is one fixed-width groupBy on the md5 of the
canonical form (identical shape to ``dedup.exact_duplicates``);
``domain_quota`` delegates to ``sampling.source_quota`` and inherits its
WindowGroupLimit map-side pre-trim — a pathologically dominant domain
(half the crawl is one CDN) never materializes on a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from temporai_mivdp_spark.llmdata import sampling

#: query parameters that never change page content — the standard
#: click/campaign trackers. Dropping ONLY a known list (not all params)
#: keeps content-bearing queries (?id=, ?page=) distinct.
TRACKING_PARAMS = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "gclid",
    "fbclid",
    "msclkid",
    "ref",
    "referrer",
)


def _strip_tracking(query: Column) -> Column:
    """Remove known tracking params from a query string, preserving the
    relative order of the surviving params."""
    parts = F.split(query, "&")
    alts = "|".join(TRACKING_PARAMS)
    kept = F.filter(parts, lambda p: ~p.rlike(f"^(?i:(?:{alts}))="))
    return F.array_join(kept, "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL, as a pure expression:

    * scheme and host lowercased; ``www.`` prefix and userinfo
      (``user:pass@``) dropped
    * fragment (``#...``) dropped
    * known tracking query params dropped (``TRACKING_PARAMS``);
      an emptied query drops its ``?`` too
    * trailing ``/`` trimmed from non-root paths; empty path -> ``/``
    * default ports ``:80`` (http) / ``:443`` (https) dropped

    The output is a URL string again (scheme://host[:port]path[?query]),
    so it can feed any URL consumer, not just hash keys. Strings with no
    ``scheme://`` pass through unchanged (trimmed) — a crawl frontier
    should not silently mangle relative references or garbage rows; feed
    them through a resolver first if they must join the canonical space.
    """
    no_frag = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1)
    )
    hostport = F.regexp_replace(hostport, r"^[^/@\[\]]*@", "")  # userinfo
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(F.length(path) > 1, F.regexp_replace(path, "/$", "")).otherwise(path)
    )
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    query = _strip_tracking(query)
    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", F.trim(url)).otherwise(canon)


def url_parts(
    df: DataFrame, url_col: str = "url", canonical: bool = True
) -> DataFrame:
    """Append ``url_canonical``, ``url_host`` and ``url_domain`` columns.

    ``url_domain`` is the registrable-domain heuristic: the last two
    host labels, or the last three when the second-to-last is a known
    second-level public-suffix label (co/ac/gov/edu/org/net + 2-letter
    ccTLD — the common cases; a production pipeline would broadcast-join
    the full public-suffix list, which this column is shaped to slot
    into)."""
    canon = canonicalize_url(F.col(url_col)) if canonical else F.col(url_col)
    out = df.withColumn("url_canonical", canon)
    host = F.regexp_extract("url_canonical", r"^[a-z0-9+.-]+://([^/:?]+)", 1)
    out = out.withColumn("url_host", host)
    labels = F.split("url_host", r"\.")
    n = F.size(labels)
    second_level = F.element_at(labels, -2)
    take3 = (n >= 3) & second_level.rlike(r"^(?:co|ac|gov|edu|org|net)$") & F.element_at(
        labels, -1
    ).rlike(r"^[a-z]{2}$")
    domain = F.when(
        n <= 2, F.col("url_host")
    ).otherwise(
        F.array_join(F.slice(labels, n - F.when(take3, 2).otherwise(1), 3), ".")
    )
    return out.withColumn("url_domain", domain)


def url_duplicates(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup groups after canonicalization: one row per
    distinct canonical URL with the keeper (min id) and the copy count —
    the URL twin of ``dedup.exact_duplicates`` (same single fixed-width
    md5 groupBy shape)."""
    keyed = df.select(
        F.col(id_col), F.md5(canonicalize_url(F.col(url_col))).alias("__k")
    )
    return (
        keyed.groupBy("__k")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__k")
        .select("keep_id", "n_copies")
    )


def domain_quota(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: str = "domain-quota",
) -> DataFrame:
    """At most ``max_per_domain`` pages per registrable domain, elected
    deterministically — ``sampling.source_quota`` over ``url_domain``
    (WindowGroupLimit pre-trim; hash-elected, so reruns and late shards
    keep the same pages)."""
    with_domain = url_parts(df, url_col=url_col)
    return sampling.source_quota(
        with_domain,
        max_per_group=max_per_domain,
        group_col="url_domain",
        key_col=id_col,
        seed=seed,
    )
