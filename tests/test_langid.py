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


def test_langid_score_rejects_mismatched_n_max(spark):
    """The meta records gram_n_max (ADVICE r10): scoring with a
    different gram order silently degrades, so it must raise."""
    df = spark.createDataFrame(_fixture())
    model, meta = langid_train(df, "lang", "text", labels=["en", "fr", "zh"])
    assert meta.gram_n_max == 3
    with pytest.raises(ValueError, match="gram_n_max=3"):
        langid_score(df, model, meta, n_max=2)
    # legacy metas (gram_n_max=None, e.g. persisted pre-field or from
    # a plain nb_train) skip the check
    import dataclasses

    legacy = dataclasses.replace(meta, gram_n_max=None)
    assert langid_score(df, model, legacy, n_max=3).count() == len(_fixture())


DE = [
    "der schnelle braune fuchs springt ueber den faulen hund am fluss",
    "sie sagte dass sie sich nach dem langen winter wiedersehen wuerden",
    "dies ist ein weiterer deutscher satz mit haeufigen kleinen woertern",
    "ein gutes buch und eine warme tasse tee machen den abend besser",
    "wir gingen durch die altstadt und sprachen ueber das wetter",
    "er konnte die schluessel heute morgen nirgendwo im haus finden",
]
ES = [
    "el rapido zorro marron salta sobre el perro perezoso junto al rio",
    "ella dijo que se volverian a ver despues de los largos meses de invierno",
    "esta es otra frase espanola con palabras pequenas y comunes",
    "un buen libro y una taza de te caliente hacen mejor la tarde",
    "caminamos por el casco antiguo y hablamos sobre el tiempo",
    "no pudo encontrar las llaves en ninguna parte de la casa esta manana",
]
JA = [
    "すばやい茶色のきつねはなまけものの犬を飛びこえて川のそばを走る",
    "彼女は長い冬が終わったらまた会いましょうと静かに言いました",
    "これはよく使われる言葉を含むもうひとつの日本語の文章です",
    "よい本とあたたかいお茶があれば夜の時間はもっと楽しくなる",
    "わたしたちは古い町を歩きながら天気について話をしました",
    "彼はけさ家のどこをさがしても鍵を見つけることができなかった",
]


def _fixture6():
    """Six languages, two of them spaceless scripts (zh, ja) — the
    pair the heuristic langid can neither tokenize nor tell apart by
    stopwords (VERDICT r10 next-round #7)."""
    rows = []
    corpora = [("en", EN), ("fr", FR), ("zh", ZH), ("de", DE),
               ("es", ES), ("ja", JA)]
    for j, (lang, docs) in enumerate(corpora):
        for i, t in enumerate(docs):
            rows.append(Row(doc_id=i * 6 + j, lang=lang, text=t))
    return rows


def test_langid_six_languages_heldout_exact_and_hashed(spark):
    """Held-out accuracy over 6 languages incl. BOTH spaceless
    scripts, exact-vocab AND hashed-feature (hash_bits=18) variants —
    the hashing trick bounds the model rows to 2^18 regardless of
    gram-vocabulary growth, the web-scale deployment shape."""
    rows = _fixture6()
    df = spark.createDataFrame(rows)
    train = df.filter("doc_id < 30")  # 5 docs per language
    test = df.filter("doc_id >= 30")  # 1 held-out doc per language
    labels = ["de", "en", "es", "fr", "ja", "zh"]
    for bits in (None, 18):
        model, meta = langid_train(
            train, "lang", "text", labels=labels, hash_bits=bits
        )
        assert meta.gram_n_max == 3
        if bits is not None:
            # hashed model is BOUNDED: <= 2^bits rows no matter the vocab
            assert model.count() <= 1 << bits
        out = langid_score(test, model, meta, keep_cols=("lang",)).collect()
        assert len(out) == 6
        for r in out:
            assert r["pred"] == r["lang"], (
                bits, r["doc_id"], r["pred"], r["lang"])
            assert r["margin"] > 0
