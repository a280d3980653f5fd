"""DOM token-sequence lexer: from-spec reference parity on adversarial
markup, engine-portability of the lexer regex, and plan shape."""

import re

from pyspark.sql import functions as F

from docling_translate_spark.operators.dom_tokens import (
    LEXER_RE,
    TAG_NAME_RE,
    dom_tokenize,
    dom_tokens_flat,
)


def _ref_tokens(text):
    """From-spec mirror of the lexer + classifier semantics."""
    out = []
    for t in re.findall(LEXER_RE, text or ""):
        if t == "<" or t == "&":
            kind = "text"
        elif t.startswith("</"):
            kind = "close"
        elif t.startswith("<!") or t.startswith("<?"):
            kind = "decl"
        elif t.startswith("<") and t.endswith("/>"):
            kind = "self"
        elif t.startswith("<"):
            kind = "open"
        elif t.startswith("&"):
            kind = "entity"
        else:
            kind = "text"
        if kind in ("open", "close", "self"):
            m = re.match(TAG_NAME_RE, t)
            tok = m.group(1).lower() if m else ""
        else:
            tok = t
        out.append((kind, tok, len(t.encode("utf-8"))))
    return out


FIXTURES = [
    '<nav><ul><li><a href="/">Home</a></li></ul></nav>',
    "<p>See the <b>spec &amp; notes</b> for doc 7</p>",
    'a < b and AT&T &#169; <br/> <DIV CLASS="x">Hi</DIV>',
    '<!DOCTYPE html><!-- c --><?xml v?><img src="a.png"/>',
    "<3> </ p> text\twith\nnewlines &bad &amp;",
    "plain text only, no markup at all.",
    "unicode: café © 한글 <p>中文</p>",
    "<div\nclass='multi\nline'>x</div>",
    "<a href='/q?a=1&b=2'>q</a>",  # & inside an attr stays in the tag
    "<hr />",  # space before the self-close slash
    "",
    None,
]


def test_dom_tokens_match_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "doc_id long, text string"
    )
    got = {}
    for r in dom_tokenize(df).collect():
        got[r.doc_id] = [(t.kind, t.tok, t.nbytes) for t in r.dom_tokens]
    for i, t in enumerate(FIXTURES):
        assert got[i] == _ref_tokens(t), f"fixture {i}: {t!r}"


def test_dom_tokens_kinds(spark):
    df = spark.createDataFrame([(0, FIXTURES[3])], "doc_id long, text string")
    toks = dom_tokenize(df).collect()[0].dom_tokens
    assert [t.kind for t in toks] == ["decl", "decl", "decl", "self"]
    assert toks[3].tok == "img"
    # declarations keep the raw lexeme
    assert toks[0].tok == "<!DOCTYPE html>"


def test_dom_tokens_byte_lengths_utf8(spark):
    df = spark.createDataFrame([(0, FIXTURES[6])], "doc_id long, text string")
    toks = dom_tokenize(df).collect()[0].dom_tokens
    by_tok = {t.tok: t.nbytes for t in toks}
    assert by_tok["café"] == 5  # 4 chars, 5 UTF-8 bytes
    assert by_tok["©"] == 2
    assert by_tok["한글"] == 6
    assert by_tok["中文"] == 6


def test_dom_tokens_flat_order_and_determinism(spark):
    rows = [(i, t) for i, t in enumerate(FIXTURES) if t]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flat = lambda d: sorted(
        (r.doc_id, r.tok_idx, r.kind, r.tok, r.nbytes)
        for r in dom_tokens_flat(d).collect()
    )
    a = flat(df)
    assert a == flat(df.repartition(7))
    # tok_idx is dense 0..n-1 per doc
    for i, t in rows:
        idxs = [r[1] for r in a if r[0] == i]
        assert idxs == list(range(len(_ref_tokens(t))))


def test_dom_tokens_plan_is_one_projection(spark):
    import contextlib
    import io

    df = spark.createDataFrame([(0, "<p>x</p>")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dom_tokenize(df).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan and "Window" not in plan
