"""Text analysis: token counts, quality features, lang-id heuristic, fingerprint."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.textstats import (
    bpe_token_estimate,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("a bb ccc",), ("single",)], "text string")
    got = [r.n for r in df.select(token_count("text").alias("n")).collect()]
    assert got == [3, 1]


def test_bpe_estimate(spark):
    # 'abcd'→1, 'abcde'→2, 'a'→1  ⇒ total 4
    df = spark.createDataFrame([("abcd abcde a",)], "text string")
    assert df.select(bpe_token_estimate("text").alias("n")).collect()[0].n == 4


def test_quality_features_and_score(spark):
    df = spark.createDataFrame([("the value table the value",)], "text string")
    row = quality_score(df).collect()[0]
    assert row.n_words == 5
    assert row.distinct_word_ratio == pytest.approx(3 / 5, abs=1e-6)
    assert row.stopword_ratio == 1.0  # every word is an en marker
    assert 0.0 <= row.quality_score <= 1.0
    # mean word len: (25 chars - 4 spaces) / 5 words
    assert row.mean_word_len == pytest.approx(21 / 5, abs=1e-6)


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [("the value of the table",), ("der und die das nicht",), ("xyzzy qwerty",)],
        "text string",
    )
    got = [r.lang_pred for r in lang_id(df).collect()]
    assert got == ["en", "de", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = [r.fingerprint for r in fingerprint(df).collect()]
    assert fps[0] == fps[1]  # case + whitespace normalized
    raw = [r.fingerprint for r in fingerprint(df, normalize=False).collect()]
    assert raw[0] != raw[1]
