"""PII scrubbing, benchmark decontamination, mixture budgeting —
fixtures plus plan shape (everything JVM-side, no Python)."""

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.operators.dedup import decontaminate
from docling_translate_spark.operators.sampling import mix_sources
from docling_translate_spark.operators.scrub import redact_pii


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_redact_pii_fixtures(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.org today"),
        (1, "call +1 555-123-4567 or 02-1234-5678"),
        (2, "server at 192.168.0.1 went down"),
        (3, "card 4111 1111 1111 1111 charged"),
        (4, "clean text with number 42 and version 3.5"),
        (5, "a@b.io then 10.0.0.7"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["clean_text"] == "mail me at [EMAIL] today"
    assert got[0]["n_email"] == 1 and got[0]["n_pii"] == 1
    assert "[PHONE]" in got[1]["clean_text"] and got[1]["n_phone"] == 2
    assert got[2]["clean_text"] == "server at [IP] went down"
    assert got[3]["clean_text"] == "card [CARD] charged"
    assert got[3]["n_card"] == 1 and got[3]["n_phone"] == 0
    # ordinary numerics untouched (precision-leaning battery)
    assert got[4]["clean_text"] == rows[4][1] and got[4]["n_pii"] == 0
    assert got[5]["clean_text"] == "[EMAIL] then [IP]"
    assert got[5]["n_pii"] == 2


def test_redact_pii_stays_jvm_side(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    plan = _plan(redact_pii(df))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_mix_sources_plan_shape(spark):
    """One tiny per-source aggregate joined back via broadcast; the kept
    rows come straight off the scan — no extra exchange on the big side
    and no Python anywhere."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(mix_sources(docs, {"src0": 0.5}, 1000))
    assert "BroadcastExchange" in plan, plan
    assert "Python" not in plan, plan
    # only the totals aggregation shuffles (inside the broadcast build)
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_decontaminate_plan_is_index_join(spark):
    """Shingle inverted-index join, aggregation on the training side —
    no cartesian, no Python beyond nothing (pure column shingles)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.limit(5)
    plan = _plan(decontaminate(docs, ev, n=4))
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven"),
            (2, "totally unrelated words here okay"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),   # exact copy of 0
            (101, "xx one two three four yy"),               # partial of 1
        ],
        "doc_id bigint, text string",
    )
    got = {r["train_id"]: r for r in decontaminate(train, ev, n=4).collect()}
    assert 0 in got and got[0]["n_eval_docs"] == 1
    assert got[0]["n_hits"] == 3  # 6 tokens -> 3 distinct 4-grams, all shared
    assert 1 in got and got[1]["n_hits"] == 1  # "one two three four"
    assert 2 not in got
    # min_hits raises the bar
    strict = {r["train_id"] for r in decontaminate(train, ev, n=4, min_hits=2).collect()}
    assert strict == {0}


def test_mix_sources_null_text_counts_zero(spark):
    """r4 review: a NULL-text row contributed -1 (sizeOfNull) to its
    source's token total, inflating the keep fraction. NULL now counts
    as zero tokens — the totals match a two-doc corpus where one doc is
    empty."""
    rows = [("s", 1, None), ("s", 2, "four words right here")]
    docs = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    # budget 2 of 4 tokens -> frac 0.5 exactly; with the -1 bug the
    # total would be 3 and frac 2/3
    out = mix_sources(docs, {"s": 1.0}, 2)
    import hashlib

    cutoff = int(0.5 * float(1 << 60))
    expected = {
        did
        for did in (1, 2)
        if int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) < cutoff
    }
    assert {r["doc_id"] for r in out.collect()} == expected


def test_mix_sources_budget_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = mix_sources(docs, weights, 2000)
    kept = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    sources = {r["source"] for r in kept}
    assert sources <= set(weights)  # absent sources dropped
    # exact membership: recompute the per-source cutoff in Python and
    # verify the kept set is precisely the under-cutoff keys (no
    # statistics — with 25-doc strata binomial bands are meaningless)
    import hashlib

    rows = docs.select("source", "doc_id", "text").collect()
    stoks: dict = {}
    for r in rows:
        t = (r["text"] or "").strip()
        stoks[r["source"]] = stoks.get(r["source"], 0) + (len(t.split()) if t else 0)
    expected = set()
    for r in rows:
        w = weights.get(r["source"])
        if w is None or stoks[r["source"]] <= 0:
            continue
        frac = min(1.0, w * float(2000) / float(stoks[r["source"]]))
        cutoff = int(frac * float(1 << 60))
        key = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16)
        if key < cutoff:
            expected.add((r["source"], r["doc_id"]))
    got = {tuple(r) for r in out.select("source", "doc_id").collect()}
    assert got == expected and got
    # deterministic under physical repartitioning
    a = {tuple(r) for r in out.select("source", "doc_id").collect()}
    b = {
        tuple(r)
        for r in mix_sources(docs.repartition(13), weights, 2000)
        .select("source", "doc_id")
        .collect()
    }
    assert a == b and a
    # a dominating budget keeps every doc of a weighted source
    all_kept = mix_sources(docs, {"src0": 1.0}, 10**9)
    assert all_kept.count() == docs.filter(F.col("source") == "src0").count()


def test_redact_pii_dates_versions_ips_precision(spark):
    """r2 ADVICE: the old dot-separated phone shape swallowed dotted
    dates/version tuples and half-ate IPv4s. Dates and versions must
    pass through untouched; IPs redact as IPs (IP pass runs first);
    anchored and dash-separated phones still redact."""
    rows = [
        (0, "released 15.08.2026 with pi 3.14.159 inside"),
        (1, "gateway 172.16.254.1 pinged"),
        (2, "call (02) 555-0199 or +82 10-1234-5678"),
        (3, "meeting on 15-08-2026 at noon"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["clean_text"] == rows[0][1] and got[0]["n_pii"] == 0
    assert got[1]["clean_text"] == "gateway [IP] pinged"
    assert got[1]["n_ip"] == 1 and got[1]["n_phone"] == 0
    assert got[2]["clean_text"] == "call [PHONE] or [PHONE]"
    assert got[2]["n_phone"] == 2
    # dash date: middle group is 2 digits, phone needs 3-4 — untouched
    assert got[3]["clean_text"] == rows[3][1] and got[3]["n_pii"] == 0


def test_redact_pii_signed_decimals_and_bare_ids_untouched(spark):
    """r3 ADVICE: the '+' phone alternative made BOTH separators
    optional, so any '+' + 7-11 digit run matched — signed decimals
    ('+3.14159') and bare ids ('+12345678') were mangled. The first
    separator is now required (space/dash only); real international
    shapes still redact."""
    rows = [
        (0, "pi is +3.14159 here"),
        (1, "order id +12345678 shipped"),
        (2, "call +1 555-123-4567 ok"),
        (3, "or +82 10-1234-5678 works"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["clean_text"] == rows[0][1] and got[0]["n_pii"] == 0
    assert got[1]["clean_text"] == rows[1][1] and got[1]["n_pii"] == 0
    assert got[2]["clean_text"] == "call [PHONE] ok"
    assert got[3]["clean_text"] == "or [PHONE] works"


def test_redact_pii_e164_bare_numbers(spark):
    """r4 review: requiring the first separator leaked separator-free
    E.164 numbers ('+15551234567') — the canonical machine-readable
    phone shape in scraped text. The E.164-ish alternative redacts
    '+' + cc + a >=9-digit bare tail while short bare ids stay put."""
    rows = [
        (0, "call +15551234567 now"),
        (1, "or +44 2071234567 works"),
        (2, "order id +12345678 shipped"),
        (3, "ref +123456789 pending"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[0]["clean_text"] == "call [PHONE] now"
    assert got[1]["clean_text"] == "or [PHONE] works"
    # 8- and 9-digit bare '+' runs: more often ids than phones
    assert got[2]["clean_text"] == rows[2][1] and got[2]["n_pii"] == 0
    assert got[3]["clean_text"] == rows[3][1] and got[3]["n_pii"] == 0


def test_filter_blocked_domains_sentence_final_dot(spark):
    """r3 ADVICE (medium): a sentence-final URL captured its host with
    the trailing '.' ('spam.example.com.'), whose suffix expansion never
    equi-joined the blocked 'example.com' — the row silently escaped.
    Trailing './-' runs are now stripped from the captured host."""
    from docling_translate_spark.operators.scrub import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "spam at https://spam.example.com. Next sentence."),
            (2, "fine at https://docs.python.org. Next sentence."),
        ],
        "doc_id long, text string",
    )
    block = spark.createDataFrame([("example.com",)], ["domain"])
    kept = [r["doc_id"] for r in filter_blocked_domains(df, block).collect()]
    assert kept == [2]


def test_filter_blocked_domains_rid_injective_on_nul_bytes(spark):
    """r3 ADVICE: the old separator-joined row hash was not injective —
    ('hi\\x00<url> ...', 'm') and ('hi', '<url> ...\\x00m') produced the
    same _rid, so the innocent NUL-bearing twin of a flagged row was
    removed too. The fixed-width per-column encoding keeps them apart;
    scraped web text does contain NUL bytes."""
    from docling_translate_spark.operators.scrub import filter_blocked_domains

    df = spark.createDataFrame(
        [
            ("hi\x00visit https://spam.net now", "m"),
            ("hi", "visit https://spam.net now\x00m"),
        ],
        "text string, meta string",
    )
    block = spark.createDataFrame([("spam.net",)], ["domain"])
    kept = [r["text"] for r in filter_blocked_domains(df, block).collect()]
    assert kept == ["hi"]


def test_filter_blocked_domains(spark):
    """C4-style URL filtering: subdomain citations of a blocked domain
    drop the row; clean and URL-free rows survive unchanged."""
    from docling_translate_spark.operators.scrub import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "see https://ads.example.com/x for offers"),
            (2, "docs at http://docs.python.org/3 are fine"),
            (3, "no urls at all here"),
            (4, "mixed https://ok.org/a and https://example.com home"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    block = spark.createDataFrame([("example.com",), ("spam.net",)], ["domain"])
    kept = sorted(
        r["doc_id"] for r in filter_blocked_domains(df, block).collect()
    )
    assert kept == [2, 3, 5]


def test_filter_blocked_domains_no_python_no_text_shuffle(spark):
    """The probe join is broadcast and the text column never shuffles."""
    import contextlib
    import io

    from docling_translate_spark.operators.scrub import filter_blocked_domains

    df = spark.createDataFrame(
        [(1, "x https://a.example.com y")], "doc_id long, text string"
    )
    block = spark.createDataFrame([("example.com",)], ["domain"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filter_blocked_domains(df, block).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan
