"""Curation pipeline composition: gates, exact dedup, near-dup removal."""

import pytest

from pyspark.sql import functions as F

from docling_translate_spark.pipeline import CurationConfig, curate_turns
from docling_translate_spark.schema import TRANSCRIPT_SCHEMA

GOOD = (
    "The quick brown fox jumps over the lazy dog and it was a good day "
    "for the animals in the park because the sun was out."
)
NEAR = (
    "The quick brown fox jumps over the lazy dog and it was a good day "
    "for the animals in the park because the moon was out."
)
GOOD2 = (
    "It is a truth universally acknowledged that the engine must scale "
    "to the size of the corpus and it should do so in the cluster."
)


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = [
        ("c1", 0, "user", GOOD, "", None),
        ("c1", 1, "user", GOOD, "", None),            # exact dup → dropped
        ("c2", 0, "user", NEAR, "", None),            # near dup → dropped
        ("c3", 0, "user", "tiny", "", None),          # min_chars gate
        ("c4", 0, "user", "zzz qqq xxx " * 20, "", None),  # no stopwords → 0.7
        ("c5", 0, "user",
         "Page 3 of 9\n\n" + GOOD2 + "\n\n---\n7", "", None),  # chrome stripped
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).cache()


def test_curation_end_to_end(spark, transcripts):
    out = curate_turns(
        transcripts, CurationConfig(min_quality=0.8, near_dup_threshold=0.7)
    ).collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    # near-dup component {c1:0, c2:0}: the min-md5-id member survives
    # (md5("c2:0") < md5("c1:0")), per the documented determinism rule
    assert keys == [("c2", 0), ("c5", 0)]
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    assert by_key[("c2", 0)]["extracted_text"] == NEAR
    # page chrome stripped from c5, content preserved
    assert by_key[("c5", 0)]["extracted_text"] == GOOD2
    assert by_key[("c5", 0)]["boilerplate_ratio"] > 0
    for r in out:
        assert r["pred_lang"] == "en"
        assert r["quality_score"] >= 0.6
        assert r["ws_tokens"] > 0 and r["bpe_tokens"] >= r["ws_tokens"]


def test_curation_no_near_dup(spark, transcripts):
    out = curate_turns(
        transcripts, CurationConfig(min_quality=0.8, near_dup=False)
    ).collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    # NEAR survives without the near-dup stage
    assert keys == [("c1", 0), ("c2", 0), ("c5", 0)]


def test_curation_exact_dedup_survives_doubled_input(spark, transcripts):
    """r4 review: the arg-min semi-join alone kept EVERY copy of the
    winning (conv_id, turn_idx) key when the input violated the
    key contract (e.g. a doubled upstream join) — the old row_number
    window kept exactly one. The dropDuplicates pre-pass restores
    one-row-per-fingerprint under any input."""
    out = curate_turns(
        transcripts.union(transcripts),
        CurationConfig(min_quality=0.8, near_dup=False),
    ).collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    assert keys == [("c1", 0), ("c2", 0), ("c5", 0)]


def test_curation_lang_gate(spark, transcripts):
    out = curate_turns(
        transcripts, CurationConfig(keep_langs=("fr",), near_dup=False)
    ).collect()
    assert out == []


def test_curation_redact_stage(spark, transcripts):
    """With redact=True the shipped text is scrubbed and all stats/
    fingerprints run over the redacted form."""
    rows = [
        ("p1", 0, "user",
         "The quick brown fox called +1 555-123-4567 and it was a fine "
         "day for the animals in the park because the sun was out.",
         "", None),
    ]
    from docling_translate_spark.schema import TRANSCRIPT_SCHEMA

    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = curate_turns(
        df, CurationConfig(min_quality=0.3, redact=True, near_dup=False)
    ).collect()
    assert len(out) == 1
    assert "[PHONE]" in out[0]["extracted_text"]
    assert "555" not in out[0]["extracted_text"]


def test_curation_decontaminate_stage(spark, transcripts):
    """Passing an eval set drops turns overlapping it by >= min_hits
    n-grams; everything else is unchanged."""
    ev = spark.createDataFrame(
        [(900, GOOD)], "doc_id bigint, text string"
    )
    base = {
        (r["conv_id"], r["turn_idx"])
        for r in curate_turns(
            transcripts, CurationConfig(min_quality=0.8, near_dup_threshold=0.7)
        ).collect()
    }
    decon = {
        (r["conv_id"], r["turn_idx"])
        for r in curate_turns(
            transcripts,
            CurationConfig(min_quality=0.8, near_dup_threshold=0.7),
            eval_set=ev,
        ).collect()
    }
    # the near-dup survivor is c2 (NEAR), which still shares 6-grams
    # with the GOOD eval doc → contaminated and dropped
    assert ("c2", 0) in base
    assert decon == base - {("c2", 0)}


def test_curation_near_dup_chain_keeps_one(spark):
    """r2 verdict #6: a near-dup chain X~Y~Z (X~Z never a candidate
    pair) must keep exactly ONE member — component-wise removal, not
    per-pair id_b dropping. conv_ids are chosen so the middle doc has
    the LARGEST md5 id of the three: per-pair dropping would then keep
    both ends (2 rows), components keep only the min-id member."""
    import hashlib

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    words = base.split()
    wa, wc = list(words), list(words)
    wa[4] = "changedword"       # X: early edit  → near Y, far from Z
    wc[25] = "otherword"        # Z: late edit   → near Y, far from X
    # middle doc na has the max md5("<conv>:0") id; min is nc
    rows = [
        ("nb", 0, "user", " ".join(wa), "", None),
        ("na", 0, "user", base, "", None),
        ("nc", 0, "user", " ".join(wc), "", None),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)

    # full 32-hex md5 keys (lexicographic min = survivor selection)
    ids = {
        c: hashlib.md5(f"{c}:0".encode()).hexdigest()
        for c in ("na", "nb", "nc")
    }
    assert ids["na"] == max(ids.values()) and ids["nc"] == min(ids.values())

    # precondition: both chain edges are LSH candidate pairs
    from docling_translate_spark.operators.dedup import minhash_lsh_pairs

    keyed = df.withColumn(
        "_nid",
        F.md5(F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))),
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            keyed, text_col="text", id_col="_nid", threshold=0.7
        ).collect()
    }
    chain = {tuple(sorted((ids["na"], ids["nb"]))),
             tuple(sorted((ids["na"], ids["nc"])))}
    assert chain <= pairs, (pairs, ids)

    out = curate_turns(
        df, CurationConfig(min_quality=0.0, near_dup_threshold=0.7)
    ).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in out] == [("nc", 0)]


def test_curation_html_strip_gate(spark):
    """html_strip drops nav/footer blocks from HTML turns but leaves
    non-HTML turns byte-identical (paragraph structure preserved), so
    extraction parity is untouched for the rest of the corpus."""
    from docling_translate_spark.pipeline import CurationConfig, curate_turns

    html_turn = (
        '<nav><a href="/">Home</a> <a href="/x">More</a></nav>'
        "<p>the quality content paragraph is long enough to pass every "
        "gate in the battery today</p>"
        "<footer>© 2026 Example Corp — All rights reserved</footer>"
    )
    plain_turn = (
        "first paragraph is long enough to pass the gates today\n\n"
        "second paragraph also long enough to pass the gates today"
    )
    t = spark.createDataFrame(
        [("c1", 0, "user", html_turn, None, None),
         ("c2", 0, "user", plain_turn, None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    cfg = CurationConfig(
        min_quality=0.0, min_chars=5, near_dup=False, html_strip=True
    )
    got = {r["conv_id"]: r["extracted_text"]
           for r in curate_turns(t, cfg).collect()}
    assert "Home" not in got["c1"] and "All rights reserved" not in got["c1"]
    assert "quality content paragraph" in got["c1"]
    # plain turn: identical to html_strip=False output
    cfg_off = CurationConfig(
        min_quality=0.0, min_chars=5, near_dup=False, html_strip=False
    )
    got_off = {r["conv_id"]: r["extracted_text"]
               for r in curate_turns(t, cfg_off).collect()}
    assert got["c2"] == got_off["c2"]


def test_curation_blocklist_drops_citing_turns(spark):
    """blocklist= drops turns citing blocked domains (subdomains too)
    right after extraction; clean turns survive."""
    from docling_translate_spark.pipeline import CurationConfig, curate_turns

    t = spark.createDataFrame(
        [("c1", 0, "user",
          "spam offer at https://ads.example.com/x with enough words "
          "to pass the gates in this battery today", None, None),
         ("c2", 0, "user",
          "a clean turn with enough words to pass the gates in this "
          "battery today", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    block = spark.createDataFrame([("example.com",)], ["domain"])
    cfg = CurationConfig(min_quality=0.0, min_chars=5, near_dup=False)
    kept = {r["conv_id"] for r in curate_turns(t, cfg, blocklist=block).collect()}
    assert kept == {"c2"}
