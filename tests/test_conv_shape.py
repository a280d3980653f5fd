"""conversation_shape: per-conversation transcript-shape profile.

Hand-computed fixtures cover every branch (axis counts, off-axis role,
NULL-role folding, tool-call flag on NULL/empty/real tool, adjacent-role
repeat counting, NULL-timestamp exclusion from duration, single-turn
conversations) plus the plan discipline: the repeat window runs over
slim rows — the text payload must never enter a Window partition.
"""

import contextlib
import datetime as dt
import io

import pytest

from docling_translate_spark.operators.metrics import conversation_shape

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _ts(sec):
    return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def shaped(spark):
    rows = [
        ("A", 0, "user", "hello", "", _ts(1000)),
        ("A", 1, "assistant", "hi there", None, _ts(1010)),
        ("A", 2, "assistant", "again", "python", _ts(1050)),
        ("A", 3, None, None, "", None),
        ("A", 4, "observer", "x", "", _ts(1100)),
        ("B", 7, "system", "boot", "", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = conversation_shape(df)
    return {r["conv_id"]: r.asDict() for r in out.collect()}, out


def test_axis_and_other_counts(shaped):
    by_conv, _ = shaped
    a = by_conv["A"]
    assert a["n_turns"] == 5
    assert a["n_role_user"] == 1
    assert a["n_role_assistant"] == 2
    assert a["n_role_system"] == 0
    assert a["n_role_tool"] == 0
    # off-axis 'observer' + NULL role (folded to '') both land in other
    assert a["n_role_other"] == 2


def test_tool_calls_and_repeats(shaped):
    by_conv, _ = shaped
    a = by_conv["A"]
    # only the non-empty tool counts (NULL and '' do not)
    assert a["n_tool_calls"] == 1
    # assistant→assistant is the single adjacent repeat
    assert a["n_role_repeats"] == 1


def test_first_last_roles(shaped):
    by_conv, _ = shaped
    a = by_conv["A"]
    assert a["first_role"] == "user"
    assert a["last_role"] == "observer"
    b = by_conv["B"]
    assert b["first_role"] == b["last_role"] == "system"


def test_char_volumes(shaped):
    by_conv, _ = shaped
    a = by_conv["A"]
    # NULL text counts zero chars
    assert a["total_chars"] == len("hello") + len("hi there") + len("again") + 0 + 1
    assert a["max_turn_chars"] == len("hi there")


def test_duration_null_handling(shaped):
    by_conv, _ = shaped
    # NULL-ts turn excluded: span is 1000..1100
    assert by_conv["A"]["duration_sec"] == 100
    # single turn with NULL ts ⇒ 0, and repeats coalesce to 0
    b = by_conv["B"]
    assert b["duration_sec"] == 0
    assert b["n_role_repeats"] == 0
    assert b["n_turns"] == 1


def test_all_long_or_string_types(shaped):
    _, out = shaped
    for f in out.schema.fields:
        assert f.dataType.simpleString() in ("string", "bigint"), f


def test_window_never_carries_text(spark):
    """Scale discipline: the repeat window runs over slim projected rows
    — no Window partition may carry the text payload (the lsh_ann
    bucket-size precedent)."""
    rows = [("A", 0, "user", "hello", "", _ts(1000))]
    df = spark.createDataFrame(rows, SCHEMA)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        conversation_shape(df).explain("formatted")
    plan = buf.getvalue()
    win_blocks = [
        b for b in plan.split("\n\n") if "Window" in b.split("\n")[0]
    ]
    assert win_blocks, plan
    for blk in win_blocks:
        assert "text#" not in blk, blk
