"""URL canonicalization + latest-crawl-wins snapshot selection.

The first stage of a crawl ingest over (url, warc_ts, ...) pages: the
same page arrives under trivially different URLs (tracking params,
fragments, host case, default ports) and under many crawl timestamps;
downstream stages want ONE row per canonical URL — the freshest.

Canonicalization is a pure JVM expression chain (lowercase scheme +
host, drop the fragment, drop default :80/:443 ports, drop tracking
params, sort surviving query params so param order never splits a
page); snapshot selection is a rank-limited window per canonical URL —
Spark plans WindowGroupLimit, so no global sort and the only shuffle
is the hash partition on the canonical key. Both are deterministic in
content only: reruns and different cluster sizes pick the same rows.

ref: the reference keys entities by opaque ids (EntityMatch has no URL
handling); this is the task-brief web-ingest extension for the
north-star input shape (url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query params that never identify content (analytics / click ids)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def canonical_url(url) -> Column:
    """Canonical form of a URL column: drop the #fragment, lowercase
    scheme and host, drop default :80/:443 ports, remove tracking
    params, sort the surviving query params (param order never splits
    a page). The path keeps its case (path case is significant on most
    servers; host case is not). Pure column expressions — narrow,
    streaming-valid, no UDF.

    Scheme-less and protocol-relative inputs ('example.com/p',
    '//host/p' — crawl data does contain them) PASS THROUGH unchanged:
    without a scheme the splits would return the whole string for both
    scheme and authority and canonicalize garbage
    ('example.com/p://example.com/p'). Passing through is the honest
    choice — we never guess a scheme, keys stay distinct and
    deterministic, and an upstream scheme-resolution stage can still
    normalize them before this one.

    "Has a scheme" means '://' in SCHEME POSITION: the prefix before
    the FIRST '://' must be an RFC-3986 scheme (ALPHA then
    alphanumerics/'+'/'-'/'.'). A '://' embedded in a query value
    ('example.com/OUT?u=https://t.com' — redirect-style crawl noise)
    does NOT make the row schemed, and the authority split always
    takes everything after the FIRST '://' — splitting at the last
    one would key 'https://a.com/r?u=https://b.com/X' by the embedded
    b.com target and wrongly merge it with the real b.com page."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(u, "#", 1)
    p = F.instr(no_frag, "://")
    raw_scheme = F.substring(no_frag, F.lit(1), p - 1)
    is_url = (p > 0) & raw_scheme.rlike("^[A-Za-z][A-Za-z0-9+.-]*$")
    scheme = F.lower(raw_scheme)
    after = F.substring(no_frag, p + 3, F.length(no_frag))
    hostport = F.lower(
        F.substring_index(F.substring_index(after, "/", 1), "?", 1)
    )
    # default-port stripping is SCHEME-AWARE: http://h:443 is a
    # different resource from https://h and must not merge with it
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    # the authority ends at the FIRST '/' OR '?' — a query can appear
    # with no path (https://h?id=5), and a '/' inside a query value
    # must not be promoted into the path
    slash = F.instr(after, "/")
    qmark = F.instr(after, "?")
    q_first = (qmark > 0) & ((slash == 0) | (qmark < slash))
    path_q = F.when(
        q_first, F.concat(F.lit("?"), F.substring(after, qmark + 1, F.length(after)))
    ).when(
        slash > 0, F.substring(after, slash, F.length(after))
    ).otherwise(F.lit(""))
    # RFC 3986 §6.2.3: for schemes that define a default authority
    # form, an empty path is equivalent to '/' — without this,
    # 'https://host' and 'https://host/' stay distinct canonical keys
    # for the same page and latest_snapshot keeps both crawl rows
    raw_path = F.substring_index(path_q, "?", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    # split at the FIRST '?' — '?' is RFC-legal unencoded inside a
    # query, so the query is everything after the first one
    pq_qmark = F.instr(path_q, "?")
    query = F.when(
        pq_qmark > 0,
        F.substring(path_q, pq_qmark + 1, F.length(path_q)),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_query = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            canon_query != "", F.concat(F.lit("?"), canon_query)
        ).otherwise(F.lit("")),
    )
    return F.when(is_url, canon).otherwise(u)


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL — the freshest crawl (max ``ts_col``;
    ties broken by ``tiebreak_col`` descending when given, so the
    winner is deterministic even for same-second recrawls). Adds the
    ``canonical_url`` column; keeps every input column."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy("canonical_url").orderBy(*order)
    return (
        pages.withColumn("canonical_url", canonical_url(url_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
