"""Per-domain corpus profile (operators/scrub.py::domain_profile).

Registered-domain fixtures are hand-derived from the documented
heuristic; the driver-gate DuckDB oracle replays the same rules, so
these pin the semantics readably.
"""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.scrub import (
    domain_profile,
    registered_domain_col,
)


def _reg(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r.d
        for r in df.select(registered_domain_col(F.col("host")).alias("d")).collect()
    ]


@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        # multi-label public suffix: keep THREE labels
        ("news.site.co.uk", "site.co.uk"),
        ("a.b.site.co.uk", "site.co.uk"),
        ("shop.example.com.au", "example.com.au"),
        # the suffix itself as a 2-label host passes through whole
        ("co.uk", "co.uk"),
        # single-label intranet host passes through whole
        ("intranet", "intranet"),
        # deep subdomain of a plain TLD: last two labels
        ("a.b.c.example.org", "example.org"),
    ],
)
def test_registered_domain(spark, host, expected):
    assert _reg(spark, [host]) == [expected]


def test_profile_rollup_and_page_dedup(spark):
    rows = [
        # 3 docs, 2 distinct pages (utm variant collapses onto /a)
        (1, "https://www.Site.co.uk/a", "xxxx"),
        (2, "https://www.site.CO.UK/a?utm_source=t", "yyy"),
        (3, "https://news.site.co.uk/b", "zz"),
        # different registered domain
        (4, "https://site.com/a", "1"),
        # non-URL row: excluded entirely
        (5, "not a url", "ignored"),
        # NULL text still counts as a doc with 0 chars
        (6, "https://site.com/b", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r.domain: r for r in domain_profile(df).collect()}
    assert set(got) == {"site.co.uk", "site.com"}
    uk = got["site.co.uk"]
    assert (uk.n_docs, uk.n_pages, uk.total_chars) == (3, 2, 9)
    com = got["site.com"]
    assert (com.n_docs, com.n_pages, com.total_chars) == (2, 2, 1)


def test_profile_is_agg_shaped(spark):
    """No Window in the plan; the count-distinct plans as a partial
    groupBy on the WIDE (domain, canonical) composite key BELOW the
    exchange, so a hot domain's pages spread across map tasks and only
    pre-aggregated slim rows (length already projected off the text
    payload) reach any exchange."""
    import re

    df = spark.createDataFrame(
        [(1, "https://e.com/a", "t")], "doc_id long, url string, text string"
    )
    plan = domain_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert re.search(
        r"HashAggregate\(keys=\[domain#\d+, _canon#\d+\], "
        r"functions=\[partial_", plan
    ), plan
