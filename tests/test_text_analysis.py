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


def test_quality_cjk_documents_score(spark):
    """r4 review: \\w is ASCII in Java/RE2 regex, so every CJK char
    counted as punctuation and whitespace word metrics were meaningless
    — a ko/zh/ja doc scored exactly 0.0 and the curation quality gate
    silently dropped languages lang_id advertises. Mostly-CJK docs now
    take a char-length band + script coherence instead."""
    rows = [
        (0, "기계 학습 모델은 대규모 데이터 집합에서 패턴을 학습하여 예측을 수행합니다"),
        (1, "机器学习模型从大规模数据集中学习模式并做出预测这是一个足够长的句子"),
        (2, "これは機械学習モデルに関する十分に長い日本語の文章でありテストに使われます"),
        (3, "the cat and the dog went to the park and it was good for them"),
        (4, "短"),  # mostly-CJK but too short for the length band
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_features(df).collect()}
    for d in (0, 1, 2):
        assert out[d]["cjk_ratio"] >= 0.3, out[d]
        assert out[d]["quality_score"] >= 0.6, out[d]
        # CJK chars are not punctuation
        assert out[d]["punct_ratio"] <= 0.2, out[d]
    # Latin prose scores exactly as before (CJK terms are zero)
    assert out[3]["cjk_ratio"] == 0.0
    assert out[3]["quality_score"] == 1.0
    # a one-char CJK doc misses the length band but keeps coherence
    assert out[4]["quality_score"] == 0.6


def test_null_text_counts_are_zero_not_negative(spark):
    """r4 review: size(split(NULL)) = -1 under default sizeOfNull and
    the trim=='' guard passes NULL through — NULL-text rows corrupted
    token sums (and packing offsets) by -1 per row."""
    df = spark.createDataFrame([(0, None), (1, "two words")], ["doc_id", "text"])
    toks = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert toks[0]["ws_tokens"] == 0 and toks[0]["bpe_tokens"] == 0
    assert toks[1]["ws_tokens"] == 2
    q = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert q[0]["n_words"] == 0 and q[0]["n_chars_q"] == 0
    assert q[0]["quality_score"] == 0.3  # only the punct term passes


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


def test_rolling_fingerprint_known_values(spark):
    """Rabin-Karp fold: hand-computed values, normalization, empties."""
    from docling_translate_spark.operators.text_analysis import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "  A  b "), (4, None)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["rolling_fp"]
        for r in rolling_fingerprint(df).select("doc_id", "rolling_fp").collect()
    }
    def rf(s):
        import re
        s = re.sub(r"\s+", " ", s.strip()).lower()
        acc = 0
        for c in s:
            acc = (acc * 31 + ord(c)) % (1 << 40)
        return acc
    assert got[1] == rf("abc") == 96354
    assert got[2] == 0
    assert got[3] == rf("a b")
    assert got[4] is None


def _winnow_ref(text, k=5, window=4):
    """Independent pure-Python winnowing (Schleimer et al. fig. 2 rules:
    rightmost window minimum, record once per selection change)."""
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        return []
    hs = []
    for i in range(len(s) - k + 1):
        acc = 0
        for c in s[i : i + k]:
            acc = (acc * 31 + ord(c)) % (1 << 40)
        hs.append(acc)
    if len(hs) <= window:
        m = min(hs)
        return [(m, max(i for i, h in enumerate(hs) if h == m))]
    out, prev = [], None
    for w0 in range(len(hs) - window + 1):
        win = hs[w0 : w0 + window]
        m = min(win)
        pos = w0 + max(i for i, h in enumerate(win) if h == m)
        if pos != prev:
            out.append((m, pos))
            prev = pos
    return out


def test_winnowing_matches_reference(spark):
    from docling_translate_spark.operators.text_analysis import winnowing_fingerprints

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "aaaaaaaaaaaaaaa"),
        (2, "short"),
        (3, ""),
        (4, "The   QUICK  brown fox"),
        (5, "abcabcabcabcabcabc"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        got.setdefault(r["sid"], []).append((r["fp"], r["pos"]))
    for did, text in texts:
        exp = _winnow_ref(text)
        assert sorted(got.get(did, [])) == sorted(exp), (did, text)


def test_winnowing_guarantee(spark):
    """Shared substrings >= window + k - 1 chars must share a fingerprint
    (the winnowing detection guarantee)."""
    from docling_translate_spark.operators.text_analysis import winnowing_fingerprints

    common = "identical shared span here"
    df = spark.createDataFrame(
        [(0, "prefix one " + common), (1, common + " suffix two")],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        fps.setdefault(r["sid"], set()).add(r["fp"])
    assert fps[0] & fps[1], "no shared fingerprint for a long shared span"


def test_winnow_overlap_pairs(spark):
    """Docs sharing a long span pair up; unrelated docs don't."""
    from docling_translate_spark.operators.text_analysis import winnow_overlap_pairs

    shared = "a long identical paragraph that both documents contain verbatim"
    df = spark.createDataFrame(
        [
            (0, "intro text. " + shared),
            (1, shared + " plus an original ending"),
            (2, "entirely different content with no overlap whatsoever xyz"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(df, min_shared=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 3
    assert all(2 not in p for p in pairs)


def test_unigram_logprob_mle(spark):
    """Corpus-MLE unigram scoring: p(token) = corpus count / total, per
    doc the mean of -log2 p; empty/NULL docs score (0, 0.0)."""
    import math

    from docling_translate_spark.operators.text_analysis import unigram_logprob

    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["avg_neg_log2p"])
           for r in unigram_logprob(df).collect()}
    assert got[1] == (3, round(-math.log2(3 / 4), 6))
    assert got[2] == (1, round(-math.log2(1 / 4), 6))
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0)


def test_unigram_logprob_rare_scores_higher(spark):
    """Rare-vocabulary docs must outscore boilerplate-heavy docs."""
    from docling_translate_spark.operators.text_analysis import unigram_logprob

    common = " ".join(["the"] * 50)
    rare = "zyx wvu tsr qpo nml"
    df = spark.createDataFrame(
        [(1, common), (2, rare)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["avg_neg_log2p"] for r in unigram_logprob(df).collect()}
    assert got[2] > got[1]
