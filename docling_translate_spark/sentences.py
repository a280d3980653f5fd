"""Deterministic rule-based sentence tokenizer.

Stands in for the reference's ``nltk.sent_tokenize`` call
(reference ``src/core.py:428``, ``src/html_generator.py:562``; Punkt model
downloaded lazily at ``src/utils.py:79-91``). Punkt is a trained model and
not reproducible without its pickle, so this engine ships a pinned rule set
instead — the fixtures in ``tests/`` define the contract:

* sentence boundary = ``. ! ?`` (optionally followed by closing quotes /
  brackets) then whitespace then an uppercase letter, digit, or opening
  quote/bracket;
* a known abbreviation immediately before the period suppresses the split
  (``e.g.``, ``i.e.``, ``Fig.``, ``Dr.``, initials …);
* newlines inside a paragraph are treated as plain whitespace;
* the final fragment is always emitted (even with no terminal punctuation).
"""

from __future__ import annotations

import re
from typing import List

ABBREVIATIONS = frozenset(
    {
        "e.g",
        "i.e",
        "etc",
        "cf",
        "vs",
        "fig",
        "figs",
        "eq",
        "eqs",
        "sec",
        "no",
        "al",  # et al.
        "mr",
        "mrs",
        "ms",
        "dr",
        "prof",
        "st",
        "jr",
        "sr",
        "inc",
        "ltd",
        "dept",
        "univ",
        "approx",
    }
)

# candidate boundary: terminator (+ closers) + whitespace + opener
_BOUNDARY_RE = re.compile(
    r"([.!?])([\"'’”\)\]]*)(\s+)(?=[\"'“‘(\[]*[A-Z0-9])"
)
# trailing token before the period, for abbreviation lookup
_TAIL_WORD_RE = re.compile(r"([A-Za-z][A-Za-z.]*)$")


def split_sentences(text: str) -> List[str]:
    """Split one text item into sentences (deterministic rule set)."""
    if not text or not text.strip():
        return []
    out: List[str] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        if m.group(1) == ".":
            prefix = text[start : m.start(1)]
            tail = _TAIL_WORD_RE.search(prefix)
            if tail:
                word = tail.group(1).rstrip(".").lower()
                # suppress split after known abbreviations and single-letter
                # initials ("J. Smith")
                if word in ABBREVIATIONS or (len(word) == 1 and word.isalpha()):
                    continue
        end = m.end(2)
        sent = text[start:end].strip()
        if sent:
            out.append(sent)
        start = m.end(3)
    tail_text = text[start:].strip()
    if tail_text:
        out.append(tail_text)
    return out
