"""UI-string localization — the engine analog of the reference's i18n
module (reference ``src/i18n.py``: a ``{lang: {key: text}}`` table and a
``t(key)`` helper resolving key → current-language string → English
fallback → the key itself, ``src/i18n.py`` ``t()``).

Rebuilt Spark-first: the same per-key fallback chain as (a) a pure
function for driver-side labels and (b) a pure column expression
(two literal maps + coalesce — JVM-side, broadcast-free, DuckDB-oracle
expressible). String table content is this engine's own (reports,
lineage, progress labels), not the reference's UI copy.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

UI_STRINGS: dict[str, dict[str, str]] = {
    "en": {
        "job_started": "Extraction job started",
        "job_done": "All conversations extracted",
        "turns_processed": "Turns processed",
        "spans_emitted": "Spans emitted",
        "boilerplate_dropped": "Boilerplate segments dropped",
        "resume_from_ckpt": "Resuming from last committed checkpoint",
        "engine_label": "Map engine",
        "report_header": "Extraction report",
    },
    "ko": {
        "job_started": "추출 작업 시작",
        "job_done": "모든 대화 추출 완료",
        "turns_processed": "처리된 턴 수",
        "spans_emitted": "생성된 스팬 수",
        "resume_from_ckpt": "마지막 커밋 체크포인트부터 재개",
        "report_header": "추출 리포트",
        # engine_label / boilerplate_dropped intentionally absent:
        # exercises the en fallback tier
    },
}

DEFAULT_LANG = "ko"  # the reference defaults its UI to Korean (i18n.py)


def t(key: str, lang: str = DEFAULT_LANG) -> str:
    """Resolve a UI string: lang table → en table → the key itself
    (the reference's exact fallback chain)."""
    return UI_STRINGS.get(lang, {}).get(
        key, UI_STRINGS.get("en", {}).get(key, key)
    )


def _lang_map(lang: str) -> Column:
    pairs: list[Column] = []
    for k, v in sorted(UI_STRINGS.get(lang, {}).items()):
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def localize_col(key: Column | str, lang: Column | str) -> Column:
    """Column-expression ``t()``: per-row (key, lang) → localized string
    with the same lang → en → key fallback chain. Literal maps, fully
    JVM-side; unknown languages fall through to English like the
    reference's ``TRANSLATIONS.get(lang, {})``."""
    key = F.col(key) if isinstance(key, str) else key
    lang = F.col(lang) if isinstance(lang, str) else lang
    chain = F.element_at(_lang_map("en"), key)
    for code in sorted(UI_STRINGS):
        if code == "en":
            continue
        chain = F.when(lang == code, F.coalesce(F.element_at(_lang_map(code), key), chain)).otherwise(chain)
    return F.coalesce(chain, key)
