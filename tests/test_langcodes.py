"""Lang-code normalization fixtures (ref translation/utils.py:11-48)."""

from docling_translate_spark.functions.langcodes import (
    LANGUAGE_NAMES,
    to_deepl_lang,
    deepl_lang_col,
    language_name_col,
)

from pyspark.sql import functions as F


def test_to_deepl_lang_pure():
    assert to_deepl_lang("en") == "EN"
    assert to_deepl_lang("EN-US") == "EN-US"
    assert to_deepl_lang("fr") == "FR"
    assert to_deepl_lang("pt-br") == "PT-BR"
    assert to_deepl_lang("deu") == "DE"  # first two letters
    assert to_deepl_lang(None) is None
    assert to_deepl_lang("") is None


def test_columns_match_pure(spark):
    codes = ["en", "EN-US", "fr", "pt-br", "deu", "ko", "zh", "auto", None]
    df = spark.createDataFrame([(c,) for c in codes], ["lang"])
    got = df.select(
        "lang",
        deepl_lang_col(F.col("lang")).alias("d"),
        language_name_col(F.col("lang")).alias("n"),
    ).collect()
    for row in got:
        assert row["d"] == to_deepl_lang(row["lang"]), row["lang"]
        if row["lang"]:
            exp = LANGUAGE_NAMES.get(row["lang"].lower(), row["lang"])
            assert row["n"] == exp, row["lang"]
