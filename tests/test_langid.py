"""langid_predict on constructed multilingual text (the driver fixture's
vocabulary is language-independent, so discrimination is tested here)."""

from __future__ import annotations

from etl_arcgis_spark.operators.text import langid_predict


def test_langid_discriminates_languages(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is on the mat"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat et la porte est sur les toits"),
            (4, "el perro y la casa es de los gatos"),
            (5, "xyzzy plugh quux"),  # no markers anywhere
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in langid_predict(df).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert out[3]["lang_pred"] == "fr"
    assert out[4]["lang_pred"] == "es"
    assert out[5]["lang_pred"] == "und"
    assert out[2]["score_de"] > out[2]["score_en"]
    # "the"x3 + "and" + "is" = 5 marker hits over 9 tokens
    assert abs(out[1]["score_en"] - round(5 / 9, 4)) < 1e-4
