"""URL canonicalization + latest-snapshot selection
(operators/urlnorm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entitymatch_spark.operators.urlnorm import canonical_url, latest_snapshot


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Site.COM:443/Path/Page?b=2&utm_source=x&a=1#frag",
        "https://www.site.com/Path/Page?a=1&b=2",
        "http://host:80/p",
        "http://host/p?fbclid=abc",
        "https://bare.example",
    ])
    # rules collapse the first two to the same canonical form
    assert got[0] == got[1] == "https://www.site.com/Path/Page?a=1&b=2"
    assert got[2] == "http://host/p"
    assert got[3] == "http://host/p"            # tracking-only query drops
    # RFC 3986 6.2.3: empty path normalizes to '/' (merges the
    # host-only and trailing-slash spellings of the same page)
    assert got[4] == "https://bare.example/"
    # path case preserved, host case folded
    assert "/Path/Page" in got[0] and "www.site.com" in got[0]


def test_canonical_url_keeps_real_ports_and_params(spark):
    got = _canon(spark, [
        "https://h:8080/x?id=7",
        "https://h/x?ref=tw&id=7",
        "http://h:443/p",
        "https://h:80/p",
    ])
    assert got[0] == "https://h:8080/x?id=7"    # non-default port kept
    assert got[1] == "https://h/x?id=7"         # ref= dropped, id= kept
    # port stripping is scheme-aware: 443 is NOT default for http,
    # 80 is NOT default for https — both must survive
    assert got[2] == "http://h:443/p"
    assert got[3] == "https://h:80/p"


def test_canonical_url_query_edge_shapes(spark):
    got = _canon(spark, [
        "https://h?id=5",                 # query with no path
        "https://h?id=6",
        "https://h?next=/home",           # '/' inside a query value
        "https://h/p?a=1?b=2",            # '?' inside the query (RFC-legal)
    ])
    # distinct querys stay distinct even without a path; the empty
    # path roots to '/' (RFC 3986 6.2.3)
    assert got[0] == "https://h/?id=5" and got[1] == "https://h/?id=6"
    # the query-value '/' is not promoted into the path
    assert got[2] == "https://h/?next=/home"
    # split at the FIRST '?': the whole 'a=1?b=2' is one query string
    assert got[3] == "https://h/p?a=1?b=2"


def test_canonical_url_schemeless_passes_through(spark):
    """No '://' -> pass through UNCHANGED (never canonicalize garbage
    like 'example.com/p://example.com/p'; we don't guess a scheme).
    Crawl data contains both bare and protocol-relative forms."""
    urls = [
        "example.com/Path?b=2&a=1#frag",      # bare scheme-less
        "//Host.COM/p?utm_source=x",          # protocol-relative
        "just-a-string",
        "HTTPS://H/p",                        # control: schemeful still canonicalizes
    ]
    got = _canon(spark, urls)
    assert got[:3] == urls[:3]
    assert got[3] == "https://h/p"


def test_latest_snapshot_picks_freshest(spark):
    pages = spark.createDataFrame(
        [
            (0, "https://a/x?utm_source=1", 10),
            (1, "https://A/x", 20),              # same canonical, fresher
            (2, "https://A/x#f", 20),            # tie on ts -> higher id wins
            (3, "https://b/y", 5),
        ],
        "doc_id long, url string, warc_ts long",
    )
    out = {r["canonical_url"]: r["doc_id"]
           for r in latest_snapshot(pages, tiebreak_col="doc_id").collect()}
    assert out == {"https://a/x": 2, "https://b/y": 3}


def test_latest_snapshot_plan(spark):
    pages = spark.createDataFrame(
        [(0, "https://a/x", 1)], "doc_id long, url string, warc_ts long"
    )
    plan = (
        latest_snapshot(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan           # rank-limited, no global sort
    assert "EvalPython" not in plan


def test_canonical_url_idempotent_fuzz(spark):
    """canonical_url is a FIXED POINT on its own output: a canonical
    form re-canonicalizes to itself. This is the property that makes
    the key safe to store — re-ingesting already-canonical URLs (a
    common pipeline re-run shape) must never re-key a page. Seeded
    generator sweeps schemes (http/https/ftp/none/protocol-relative),
    messy host case, default and real ports, tracking and real params
    in shuffled order, '/'-and-'?'-bearing query values, fragments."""
    import random

    rng = random.Random(42)
    schemes = ["http://", "https://", "HTTPS://", "FTP://", "", "//"]
    hosts = ["Site.com", "www.EXAMPLE.org", "h", "a.b.c.d"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/Path/Page", "/p", "/a/b/c"]
    params = [
        "a=1", "b=2", "id=5/6", "q=x?y", "utm_source=feed", "fbclid=zz",
        "ref=tw", "z=", "u=https://t.com/X", "next=HTTP://a.b/c?d=1",
    ]
    frags = ["", "#f", "#frag/with?stuff"]
    urls = []
    for _ in range(400):
        ps = rng.sample(params, rng.randrange(0, 5))
        q = ("?" + "&".join(ps)) if ps else ""
        urls.append(
            rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + q + rng.choice(frags)
        )
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    bad = [(u, a, b) for u, a, b in zip(urls, once, twice) if a != b]
    assert not bad, bad[:5]


def test_canonical_url_embedded_scheme_in_query(spark):
    """A '://' inside a query value must not change which URL is being
    keyed: schemed redirect-style URLs split at the FIRST '://' (keying
    by the embedded target would merge the redirect page with the real
    target page), and scheme-less rows with an embedded '://' still
    pass through (the '://' is not in scheme position)."""
    got = _canon(spark, [
        "https://a.com/r?u=https://b.com/X",
        "https://b.com/X",
        "Example.com/OUT?u=HTTPS://T.com/Path",
        "//host/p?u=http://x.y/z",
        "HTTPS://A.com/r?u=https://b.com/X&utm_source=f",
    ])
    assert got[0] == "https://a.com/r?u=https://b.com/X"
    assert got[1] == "https://b.com/X"
    assert got[0] != got[1]                       # no redirect/target merge
    assert got[2] == "Example.com/OUT?u=HTTPS://T.com/Path"   # pass through
    assert got[3] == "//host/p?u=http://x.y/z"                # pass through
    assert got[4] == "https://a.com/r?u=https://b.com/X"      # rules still fire


def test_canonical_url_empty_path_is_root(spark):
    """RFC 3986 6.2.3: an empty path is equivalent to '/' — without the
    rule 'https://host' and 'https://host/' were distinct canonical
    keys and latest_snapshot kept both crawl rows of the same page."""
    from entitymatch_spark.operators.urlnorm import canonical_url

    df = spark.createDataFrame(
        [("https://Example.com",), ("https://example.com/",),
         ("https://example.com?b=2&a=1",), ("https://example.com/?b=2&a=1",)],
        "url string",
    )
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got[0] == got[1] == "https://example.com/"
    assert got[2] == got[3] == "https://example.com/?a=1&b=2"
