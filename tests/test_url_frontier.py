"""URL canonicalization + crawl-frontier dedup (operators/scrub.py).

Every expected canonical string is hand-derived from the documented
rule list; the same rules are replayed by the driver-gate DuckDB
oracle, so these fixtures are the single place the semantics are
pinned readably.
"""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.scrub import canonical_url_col, url_frontier


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    ]


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme+host lowercase, default https port dropped, fragment
        # dropped, tracking params dropped, survivors sorted
        (
            "HTTPS://WWW.Example.COM:443/Path/x?utm_source=tw&b=2&a=1&fbclid=zz#frag",
            "https://www.example.com/Path/x?a=1&b=2",
        ),
        ("http://example.com:80/", "http://example.com/"),
        # non-default port kept, numerically normalized
        ("http://example.com:0080/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # empty path -> '/'
        ("https://example.com", "https://example.com/"),
        ("https://example.com?q=1", "https://example.com/?q=1"),
        # userinfo and trailing host dots dropped
        ("https://user:pw@Example.com./a", "https://example.com/a"),
        # empty params dropped; '=' kept inside values
        ("https://e.com/p?&&x=a=b&", "https://e.com/p?x=a=b"),
        # utm_* prefix family, case-insensitive keys
        ("https://e.com/p?UTM_Medium=m&Gclid=g&keep=1", "https://e.com/p?keep=1"),
        # query emptied entirely -> no '?'
        ("https://e.com/p?utm_source=x", "https://e.com/p"),
        # '?' inside fragment is NOT a query
        ("https://e.com/p#frag?x=1", "https://e.com/p"),
        # path preserved byte-for-byte (no dot-segment resolution)
        ("https://e.com/a/../b", "https://e.com/a/../b"),
    ],
)
def test_canonical_forms(spark, raw, expected):
    assert _canon(spark, [raw]) == [expected]


@pytest.mark.parametrize(
    "raw",
    [
        "not a url",
        "ftp://example.com/file",  # non-http scheme
        "https:///missing-host",
        "example.com/no-scheme",
        "",
    ],
)
def test_non_urls_are_null(spark, raw):
    assert _canon(spark, [raw]) == [None]


def test_frontier_collapses_variants(spark):
    rows = [
        (1, "https://E.com/p?b=2&a=1"),
        (2, "https://e.com:443/p?a=1&b=2&utm_source=x"),
        (3, "https://e.com/p?a=1&b=2#frag"),
        (4, "https://e.com/other"),
        (5, "junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        (r.canonical_url, r.first_id, r.n_seen)
        for r in url_frontier(df).collect()
    }
    assert got == {
        ("https://e.com/p?a=1&b=2", 1, 3),
        ("https://e.com/other", 4, 1),
    }


def test_frontier_plan_is_agg_shaped(spark):
    # the frontier must be a groupBy (map-side combinable), never a
    # window/rank over the canonical key (hot-URL melt)
    df = spark.createDataFrame([(1, "https://e.com/")], "doc_id long, url string")
    plan = url_frontier(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan
