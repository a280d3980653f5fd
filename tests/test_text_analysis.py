"""Text-analysis fixtures: lang-id, quality, token counts, fingerprint."""

import pytest

from docling_translate_spark.operators.text_analysis import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat and the dog went to the park and it was good for them"),
        (1, "el perro y el gato en la casa es que de un una"),
        (2, "한국어 문장입니다 이것은"),
        (3, "xqz zzz qqq"),
        (4, ""),
        (5, "First sentence, with punctuation! And more; yes."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_lang_id(spark, texts):
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(texts).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "ko"
    assert out[3] == "unknown"
    assert out[4] == "unknown"


def test_quality(spark, texts):
    out = {r["doc_id"]: r for r in quality_features(texts).collect()}
    assert out[0]["quality_score"] == 1.0  # clean english prose
    assert out[4]["quality_score"] < 1.0
    assert out[4]["n_words"] == 0
    assert out[0]["stop_ratio"] > 0.2
    assert 0 < out[5]["punct_ratio"] < 0.2


def test_token_counts(spark, texts):
    out = {r["doc_id"]: r for r in token_counts(texts).collect()}
    assert out[0]["ws_tokens"] == 15
    assert out[4]["ws_tokens"] == 0
    # "First sentence, with punctuation! And more; yes." →
    # words: First sentence with punctuation And more yes (7) + , ! ; . (4)
    assert out[5]["bpe_tokens"] == 11


def test_fingerprint(spark):
    rows = [
        (0, "Some  Text\nhere"),
        (1, "some text here"),   # same after normalization
        (2, "different"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert len(out[0]) == 32
