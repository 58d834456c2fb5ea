"""Scored language ID (textstats.with_langid): accuracy on a small
multilingual fixture must beat the round-1 stopword-CASE baseline, and the
scorer must stay a zero-shuffle map-side projection."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_textract_transformer_pipeline_spark.operators.textstats import (
    LANGID2_ORDER,
    langid_sql,
    with_langid,
)

# five sentences per language, ordinary web-prose register
FIXTURE = {
    "en": [
        "the cat sat on the mat and it was happy that evening",
        "she said that the weather was fine and the trip was short",
        "most of the people in the room thought it was a good idea",
        "the station is far away and the train was late again",
        "it was the best of times and it was the worst of times",
    ],
    "de": [
        "der hund ist nicht in das haus und die katze schläft",
        "die kinder spielen nicht mehr und der regen hört auf",
        "das ist ein gutes beispiel und die übung ist wichtig",
        "der zug ist spät und die verbindung ist nicht gut heute",
        "die regierung hat ein neues gesetz und die zeitung berichtet",
    ],
    "fr": [
        "le chien est dans la maison et les enfants qui jouent",
        "les gens qui ne sont pas dans le train vont attendre",
        "c'est une belle journée et le soleil brille dans le ciel",
        "le gouvernement annonce une réforme qui ne plaît pas",
        "les résultats dans le rapport ne sont pas une surprise",
    ],
    "es": [
        "el perro es una mascota que vive en la casa y los niños juegan",
        "los resultados de la elección y la reacción de la gente",
        "la educación es importante y los libros son una herramienta",
        "el tren llega tarde y los pasajeros esperan en la estación",
        "la canción que escuchamos es una composición del músico",
    ],
    "pt": [
        "o cachorro não é uma ameaça e está em casa do lado da janela",
        "a situação do país não é simples e a população está em dúvida",
        "não há solução fácil para a questão da educação em geral",
        "o governo do estado não fez a manutenção da estação",
        "a informação do jornal não é uma confirmação oficial",
    ],
    "it": [
        "il cane che non è stanco corre per il parco con gli amici",
        "i risultati non sono una sorpresa per il governo italiano",
        "la stazione è lontana e il treno non è in orario oggi",
        "questa è una soluzione che non funziona per la situazione",
        "il giornale scrive che la decisione non è definitiva",
    ],
    "nl": [
        "de hond is niet in het huis en een kat van de buren slaapt",
        "het weer is niet goed en de trein is te laat vandaag",
        "een van de kinderen is niet naar school en het regent",
        "de snelheid van het netwerk is niet een groot probleem",
        "het bestuur heeft een besluit en de krant schrijft erover",
    ],
}


def _fixture_df(spark):
    rows = []
    i = 0
    for lg, sents in FIXTURE.items():
        for s in sents:
            rows.append((i, lg, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_scorer_beats_case_baseline(spark):
    df = _fixture_df(spark)
    scored = with_langid(df).withColumn(
        "old_pred", F.expr(langid_sql("text", "spark")))
    rows = scored.collect()
    n = len(rows)
    acc_new = sum(r.lang_pred == r.lang for r in rows) / n
    acc_old = sum(r.old_pred == r.lang for r in rows) / n
    # the CASE baseline only knows en/de/fr/es — ceiling 4/7
    assert acc_new > acc_old, (acc_new, acc_old)
    assert acc_new >= 0.9, [
        (r.lang, r.lang_pred, r.text[:40]) for r in rows
        if r.lang_pred != r.lang]


def test_scorer_edge_cases(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "zzz qqq xxx 123"),
         (2, "The\nstation is far away and the\ttrain was late."),
         (3, "THE STATION IS FAR AWAY AND THE TRAIN WAS THE PROBLEM")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in with_langid(df).collect()}
    assert out[0].lang_pred == "und" and out[1].lang_pred == "und"
    # newline/tab word boundaries and case folding both normalize
    assert out[2].lang_pred == "en" and out[3].lang_pred == "en"


def test_langid_plan_is_map_side(spark):
    df = _fixture_df(spark)
    plan = with_langid(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert all(f"score_{lg}" in with_langid(df).columns
               for lg in LANGID2_ORDER)
