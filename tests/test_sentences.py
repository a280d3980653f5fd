"""Pinned fixtures for the deterministic sentence tokenizer (the engine's
Punkt stand-in; reference calls nltk.sent_tokenize at core.py:428)."""

from docling_translate_spark.sentences import split_sentences


def test_basic_split():
    assert split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]


def test_abbreviations_suppress():
    assert split_sentences("See e.g. Fig. 3 for details. Next sentence.") == [
        "See e.g. Fig. 3 for details.",
        "Next sentence.",
    ]
    assert split_sentences("Dr. Smith agreed. It works.") == [
        "Dr. Smith agreed.",
        "It works.",
    ]


def test_initials():
    assert split_sentences("J. Smith wrote it. True story.") == [
        "J. Smith wrote it.",
        "True story.",
    ]


def test_no_terminal_punct():
    assert split_sentences("trailing fragment") == ["trailing fragment"]
    assert split_sentences("First. trailing fragment") == ["First. trailing fragment"]


def test_lowercase_continuation_not_split():
    # boundary requires an uppercase/digit start on the next token
    assert split_sentences("approx. half remained. Done.") == [
        "approx. half remained.",
        "Done.",
    ]


def test_quotes_and_brackets():
    assert split_sentences('He said "stop." Then left.') == [
        'He said "stop."',
        "Then left.",
    ]


def test_empty():
    assert split_sentences("") == []
    assert split_sentences("   ") == []


def test_newline_boundary():
    assert split_sentences("First line.\nSecond thing.") == [
        "First line.",
        "Second thing.",
    ]
