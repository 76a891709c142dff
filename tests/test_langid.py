"""Trained char-n-gram language ID: learnability on a multi-script
fixture (the proof the synthetic-corpus driver row can't give), NULL
handling, and gram-bridge shape."""

import pytest
from pyspark.sql import Row

from updater_spark.operators.classifier import (
    langid_gram_text,
    langid_score,
    langid_train,
)

EN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "she said that they would meet again after the long winter months",
    "this is another plain english sentence with common little words",
    "a good book and a warm cup of tea make the evening better",
    "we walked through the old town and talked about the weather",
    "he could not find the keys anywhere in the house this morning",
]
FR = [
    "le renard brun saute par dessus le chien paresseux pres de la riviere",
    "elle a dit qu ils se reverraient apres les longs mois d hiver",
    "ceci est une autre phrase francaise avec des petits mots courants",
    "un bon livre et une tasse de the chaud rendent la soiree meilleure",
    "nous avons marche dans la vieille ville et parle du temps qu il fait",
    "il ne trouvait pas les cles dans la maison ce matin la",
]
ZH = [
    "敏捷的棕色狐狸跳过了懒狗在河边附近的地方",
    "她说他们会在漫长的冬季过后再次见面的",
    "这是另一个包含常用词语的中文句子示例",
    "一本好书和一杯热茶让夜晚变得更加美好",
    "我们穿过老城区一边走一边谈论着天气",
    "他今天早上在房子里哪儿都找不到钥匙",
]


def _fixture():
    rows = []
    for i, t in enumerate(EN):
        rows.append(Row(doc_id=i * 3, lang="en", text=t))
    for i, t in enumerate(FR):
        rows.append(Row(doc_id=i * 3 + 1, lang="fr", text=t))
    for i, t in enumerate(ZH):
        rows.append(Row(doc_id=i * 3 + 2, lang="zh", text=t))
    return rows


def test_langid_learns_multiscript(spark):
    """Held-out accuracy: train on 5/6 of each language, classify the
    rest — including the SPACELESS Chinese doc the word-token
    heuristic cannot even tokenize."""
    rows = _fixture()
    df = spark.createDataFrame(rows)
    train = df.filter("doc_id < 15")
    test = df.filter("doc_id >= 15")
    model, meta = langid_train(
        train, "lang", "text", labels=["en", "fr", "zh"]
    )
    out = langid_score(
        test, model, meta, keep_cols=("lang",)
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["pred"] == r["lang"], (r["doc_id"], r["pred"], r["lang"])
        assert r["margin"] > 0


def test_langid_gram_text_shape(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab  cd")])
    g = langid_gram_text(df, "text", 2).select("_lid_grams").first()[0]
    # whitespace runs collapse to ONE '_'; 1-grams then 2-grams
    assert g == "a b _ c d ab b_ _c cd"


def test_langid_gram_text_cjk_codepoints(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="日本語")])
    g = langid_gram_text(df, "text", 3).select("_lid_grams").first()[0]
    assert g == "日 本 語 日本 本語 日本語"


def test_langid_null_text_scores_priors_only(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows)
    model, meta = langid_train(df, "lang", "text", labels=["en", "fr", "zh"])
    nulls = spark.createDataFrame(
        [Row(doc_id=99, lang=None, text=None)],
        "doc_id long, lang string, text string",
    )
    out = langid_score(nulls, model, meta).collect()
    assert len(out) == 1
    # equal priors (6 docs each) -> exact tie -> first label wins
    assert out[0]["pred"] == "en"
    assert out[0]["margin"] == pytest.approx(0.0)
