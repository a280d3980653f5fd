"""Language-code normalization (reference ``src/translation/utils.py``).

* code → display name map (``LANGUAGE_NAMES``,
  ``src/translation/utils.py:11-25``)
* project code → DeepL code (``to_deepl_lang``,
  ``src/translation/utils.py:27-48``: explicit map for common codes,
  else region codes upper-cased whole, else first two letters upper)

Both as pure functions and as column expressions (JVM-side `when`
chains / map lookups, DuckDB-oracle expressible).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

LANGUAGE_NAMES = {
    "en": "English",
    "ko": "Korean",
    "ja": "Japanese",
    "zh": "Chinese",
    "fr": "French",
    "de": "German",
    "es": "Spanish",
    "ru": "Russian",
    "it": "Italian",
    "pt": "Portuguese",
    "ar": "Arabic",
    "hi": "Hindi",
    "auto": "the source language",
}

_DEEPL_EXPLICIT = {
    "en": "EN",
    "en-us": "EN-US",
    "en-gb": "EN-GB",
    "ko": "KO",
    "ja": "JA",
    "zh": "ZH",
}


def to_deepl_lang(code: str | None) -> str | None:
    """Pure reimplementation of the reference's mapping rules."""
    if not code:
        return None
    code = code.lower()
    if code in _DEEPL_EXPLICIT:
        return _DEEPL_EXPLICIT[code]
    if "-" in code:
        return code.upper()
    return code[:2].upper()


def language_name_col(code: Column) -> Column:
    """code → display name, unknown codes fall back to the code itself."""
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in LANGUAGE_NAMES.items())
    )
    return F.coalesce(F.element_at(m, F.lower(code)), code)


def deepl_lang_col(code: Column) -> Column:
    """Column mirror of :func:`to_deepl_lang`."""
    lc = F.lower(code)
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in _DEEPL_EXPLICIT.items())
    )
    return F.when(code.isNull() | (lc == ""), F.lit(None)).otherwise(
        F.coalesce(
            F.element_at(m, lc),
            F.when(lc.contains("-"), F.upper(lc)).otherwise(
                F.upper(F.substring(lc, 1, 2))
            ),
        )
    )
