"""Unit fixtures for the per-format segmentation kernels.

Offsets, types, and line numbers are pinned against hand-computed
expectations that reproduce the reference's observable behavior
(/root/reference/src/text_parser.py), including the deliberately lossy
paragraph-offset arithmetic (pos advances by len(para)+2 regardless of the
real separator width, text_parser.py:231-234).
"""

from pyspark.sql import functions as F

from docling_translate_spark.segmenters import (
    detect_format,
    segment_c_style,
    segment_config,
    segment_markdown,
    segment_plaintext,
    segment_python,
    segment_shell,
    segment_text,
)


def test_plaintext_paragraphs():
    content = "Para one.\n\nPara two.\n\n\nPara three."
    segs = segment_plaintext(content)
    # split('\n\n') → ['Para one.', 'Para two.', '\nPara three.']
    assert [s[0] for s in segs] == ["Para one.", "Para two.", "\nPara three."]
    assert [(s[1], s[2]) for s in segs] == [(0, 9), (11, 20), (22, 34)]
    assert all(s[3] and s[4] == "prose" for s in segs)
    assert [s[5] for s in segs] == [1, 3, 5]


def test_plaintext_whole_fallback():
    # single paragraph, no blank lines → one segment via the normal path
    segs = segment_plaintext("just one line")
    assert segs == [("just one line", 0, 13, True, "prose", 1)]


def test_plaintext_empty():
    assert segment_plaintext("") == []
    assert segment_plaintext("   \n  \n") == []


def test_markdown_fenced_code():
    content = "Intro text.\n\n```py\nx = 1\n```\n\nOutro."
    segs = segment_markdown(content)
    kinds = [(s[4], s[3]) for s in segs]
    assert kinds == [("prose", True), ("code_block", False), ("prose", True)]
    intro, code, outro = segs
    # markdown prose is stripped (text_parser.py:224)
    assert intro[0] == "Intro text."
    assert code[0] == "```py\nx = 1\n```"
    assert (code[1], code[2]) == (13, 28)
    assert outro[0] == "Outro."


def test_markdown_tilde_fence():
    content = "~~~\ncode\n~~~"
    segs = segment_markdown(content)
    assert segs == [("~~~\ncode\n~~~", 0, 12, False, "code_block", 1)]


def test_markdown_inline_code_stays_prose():
    segs = segment_markdown("Use `foo()` here.")
    assert segs == [("Use `foo()` here.", 0, 17, True, "prose", 1)]


def test_python_docstring_per_line():
    content = '"""Doc line one.\nDoc line two.\n"""\nx = 1\n'
    segs = segment_python(content)
    docs = [s for s in segs if s[4] == "docstring"]
    # per-line split, blank lines dropped; all share the match offsets
    assert [d[0] for d in docs] == ['"""Doc line one.', "Doc line two.", '"""']
    assert all((d[1], d[2]) == (0, 34) for d in docs)
    assert [d[5] for d in docs] == [1, 2, 3]
    code = [s for s in segs if s[4] == "code"]
    assert code == [("\nx = 1\n", 34, 41, False, "code", 3)]


def test_python_comment_and_code():
    content = "x = 1  # set x\ny = 2\n"
    segs = segment_python(content)
    assert segs[0] == ("x = 1  ", 0, 7, False, "code", 1)
    assert segs[1] == ("# set x", 7, 14, True, "comment", 1)
    assert segs[2] == ("\ny = 2\n", 14, 21, False, "code", 1)


def test_python_single_quote_docstring():
    segs = segment_python("'''one liner'''")
    assert segs == [("'''one liner'''", 0, 15, True, "docstring", 1)]


def test_c_style_comments():
    content = "int x; // note\n/* block\n   two */\nint y;\n"
    segs = segment_c_style(content)
    assert segs[0] == ("int x; ", 0, 7, False, "code", 1)
    assert segs[1] == ("// note", 7, 14, True, "line_comment", 1)
    assert segs[2][0] == "/* block\n   two */"
    assert segs[2][4] == "block_comment"
    assert segs[3][4] == "code"


def test_shell_shebang_excluded():
    content = "#!/bin/bash\n# real comment\necho hi\n"
    segs = segment_shell(content)
    # shebang line stays inside the leading code span
    assert segs[0] == ("#!/bin/bash\n", 0, 12, False, "code", 1)
    assert segs[1] == ("# real comment", 12, 26, True, "comment", 2)
    assert segs[2] == ("\necho hi\n", 26, 35, False, "code", 2)


def test_config_whole_blob():
    content = '{"a": 1}'
    assert segment_config(content) == [(content, 0, 8, True, "config", 1)]


def test_detect_format():
    assert detect_format("#!/bin/sh\necho") == "shell"
    assert detect_format("Has a ```fence```... \n```\nx\n```") == "markdown"
    assert detect_format("def f():\n    pass") == "python"
    assert detect_format("// comment\nint x;") == "c_style"
    assert detect_format('{"k": 1}') == "config"
    assert detect_format("plain words") == "plaintext"


def test_detect_format_col_matches_python(spark):
    """The JVM column dispatch must agree with the Python kernel on
    every decision branch, priority interaction, and edge: tool hints
    (case/space variants, unknown tools), shebangs, fences, python/c
    hints needing multiline anchors, JSON-ish open without close,
    trailing whitespace before the closer, empty/None text."""
    from docling_translate_spark.segmenters import detect_format_col

    cases = [
        ("#!/bin/sh\necho", None),
        ("text\n#!/bin/sh", None),  # shebang NOT at start -> not shell
        ("Has a ```fence```", None),
        ("~~~\nblock\n~~~", None),
        ("def f():\n    pass", None),
        ("  class A:\n  pass", None),
        ('"""doc"""\nx = 1', None),
        ("from a.b import c", None),
        ("prose mentioning def inition only", None),
        ("// comment\nint x;", None),
        ("  /* block */ int y;", None),
        ("ratio 3/4 not a comment", None),
        ('{"k": 1}', None),
        ('  [1, 2, 3]  \n', None),
        ('{"unclosed": 1', None),  # no closing brace -> plaintext
        ("plain words", None),
        ("", None),
        (None, None),
        ("anything", "PYTHON"),      # tool hint wins, case-folded
        ("anything", "  cpp  "),     # tool hint wins, trimmed
        # Python str.strip() removes ALL isspace() chars, not just
        # ASCII spaces — the JVM normalizer must match (F.trim would
        # route these to the text ladder)
        ("anything", "python\t"),    # tab-padded hint
        ("anything", "python\n"),    # newline-padded hint
        ("anything", " json "),  # NBSP-padded hint
        ("anything", "bash\x1c"),    # FS separator (isspace in Python)
        ("anything", "unknown-tool"),  # unknown tool falls through
        ("", "json"),                # tool hint beats the empty check
        ("def f(): pass", "bash"),   # hint beats content heuristics
        # non-ASCII whitespace: Python \s is Unicode-wide (and also
        # covers \x1c-\x1f); the JVM patterns carry (?U) + the widened
        # class so these route identically on both kernels
        (" {\"k\": 1}", None),          # NBSP-indented JSON
        ("{\"k\": 1} ", None),          # NBSP tail before rstrip
        ("{\"k\": 1} ", None),          # LS tail
        (" def f():\n    pass", None),  # LS-led python hint
        ("x def f(): pass", None),      # LS is NOT a ^ line break
        ("x // c", None),               # (^|\n) unaffected by LS
        ("\x1c[1, 2]\x1d", None),            # FS/GS separators as ws
        ("　import os", None),           # ideographic space indent
        ("x\r\ndef f():\n    pass", None),   # ^ after \r\n on both
    ]
    from docling_translate_spark.segmenters import detect_format as df_py

    expected = [df_py(t or "", tl or None) for t, tl in cases]
    sdf = spark.createDataFrame(cases, "text string, tool string")
    got = [
        r["fam"]
        for r in sdf.select(
            detect_format_col(F.col("text"), F.col("tool")).alias("fam")
        ).collect()
    ]
    assert got == expected
    assert detect_format("anything", tool="python") == "python"
    assert detect_format("anything", tool="BASH") == "shell"


def test_segment_text_dispatch():
    segs = segment_text("x = 1 # c", tool="python")
    assert any(s[4] == "comment" for s in segs)
