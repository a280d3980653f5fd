"""i18n localization: pure t() vs column expression consistency and the
reference's three-tier fallback chain (lang → en → key)."""

from docling_translate_spark.functions.i18n import UI_STRINGS, localize_col, t

from pyspark.sql import functions as F


def test_fallback_chain_pure():
    assert t("job_started", "ko") == UI_STRINGS["ko"]["job_started"]
    assert t("job_started", "en") == UI_STRINGS["en"]["job_started"]
    # key absent in ko → en tier
    assert t("engine_label", "ko") == UI_STRINGS["en"]["engine_label"]
    # unknown lang → en tier
    assert t("job_started", "de") == UI_STRINGS["en"]["job_started"]
    # unknown key everywhere → the key itself
    assert t("no_such_key", "ko") == "no_such_key"
    assert t("no_such_key", "xx") == "no_such_key"


def test_column_matches_pure(spark):
    keys = sorted(UI_STRINGS["en"]) + ["no_such_key"]
    langs = ["ko", "en", "de", "xx"]
    rows = [(k, lang) for k in keys for lang in langs]
    df = spark.createDataFrame(rows, "ui_key string, ui_lang string")
    got = {
        (r["ui_key"], r["ui_lang"]): r["localized"]
        for r in df.withColumn(
            "localized", localize_col("ui_key", "ui_lang")
        ).collect()
    }
    for k, lang in rows:
        assert got[(k, lang)] == t(k, lang), (k, lang)


def test_column_stays_jvm_side(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [("job_started", "ko")], "ui_key string, ui_lang string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.withColumn("localized", localize_col("ui_key", "ui_lang")).explain()
    assert "Python" not in buf.getvalue()
