"""Template-family detection: numbered system-prompt variants fold into
one family via the CCNet normalization; first-turn selection is an
arg-min (never a window); min_family filters singletons.
"""

import contextlib
import io

import pytest

from docling_translate_spark.operators.metrics import template_families

SCHEMA = "conv_id string, turn_idx int, text string"


@pytest.fixture(scope="module")
def fams(spark):
    rows = [
        # three conversations sharing a numbered template; the CCNet
        # fold is per-DIGIT (#7→0, #42→00), so same-width numbers fold
        ("a", 0, "You are agent #7! Be helpful."),
        ("a", 1, "later turn, ignored"),
        ("b", 0, "You are agent #42! Be helpful."),  # 2-digit: own family
        ("c", 0, "you are AGENT #0 be helpful"),  # case/punct variants fold
        # the first turn wins by turn_idx, not row order
        ("d", 5, "You are agent #9! Be helpful."),
        ("d", 2, "something else entirely"),
        # a singleton: filtered by min_family=2
        ("e", 0, "unique snowflake opener"),
        # NULL first turn folds to '' — its own family needs 2 members
        ("f", 0, None),
        ("g", 0, "   "),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = template_families(df, prefix_chars=50, min_family=2)
    return {r["sample_prefix"]: r.asDict() for r in out.collect()}


def test_numbered_variants_fold_into_one_family(fams):
    # a (#7) and c (#0) fold — one-digit numbers, case/punct variants
    fam = fams["you are agent 0 be helpful"]
    assert fam["n_convs"] == 2
    assert fam["rep_conv_id"] == "a"


def test_first_turn_is_argmin_not_row_order(fams):
    # conv d's turn_idx=2 text is the first turn → d is NOT in the
    # template family (its turn 5 carries the template); its real
    # opener is a singleton, filtered
    assert not any("something else" in k for k in fams)


def test_singletons_filtered(fams):
    assert not any("snowflake" in k for k in fams)
    # b's 2-digit variant ('agent 00') is its own family of one
    assert not any("agent 00" in k for k in fams)


def test_null_and_blank_first_turns_form_the_empty_family(fams):
    assert "" in fams
    assert fams[""]["n_convs"] == 2
    assert fams[""]["rep_conv_id"] == "f"


def test_types_and_fp_shape(fams):
    for v in fams.values():
        assert isinstance(v["template_fp"], str) and len(v["template_fp"]) == 32
        assert isinstance(v["n_convs"], int)


def test_null_turn_idx_excluded(spark):
    # a turn without an index can never be "the first turn" (and SQL
    # arg_min skips NULL ordering keys — engine consistency)
    rows = [
        ("a", None, "would-be template, must be ignored"),
        ("a", 3, "real opener"),
        ("b", 0, "real opener"),
        # a conversation with ONLY NULL indices vanishes entirely
        ("z", None, "phantom"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r["sample_prefix"]: r.asDict()
        for r in template_families(df, prefix_chars=50, min_family=1).collect()
    }
    assert list(out) == ["real opener"]
    assert out["real opener"]["n_convs"] == 2


def test_param_validation(spark):
    df = spark.createDataFrame([("a", 0, "x")], SCHEMA)
    with pytest.raises(ValueError):
        template_families(df, prefix_chars=0)


def test_no_window_all_agg(spark):
    df = spark.createDataFrame([("a", 0, "x"), ("a", 1, "y")], SCHEMA)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        template_families(df).explain("simple")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    # the arg-min groupBy partially aggregates below the exchange
    assert "partial_min" in plan or "HashAggregate" in plan
