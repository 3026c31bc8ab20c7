"""Text-analysis operators for training-data pipelines.

Language-ID, quality scoring, token counting, and document
fingerprinting over the `documents` table — each a pure-builtin
DataFrame transform with an exact DuckDB oracle. At 100 TB these are
embarrassingly parallel scans: no shuffle at all except where a final
aggregation is the point of the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hcdc_spark.catalog import load_tables
from hcdc_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_REGEX,
    count_in_set,
    duck_in_set,
    duck_words,
    sum_word_lengths,
    word_count,
    words,
)
from hcdc_spark.registry import Registry

REG = Registry()

_W = duck_words("text")


@REG.add(
    "q30_text_quality",
    f"""
    SELECT doc_id,
           len({_W}) AS n_words,
           LENGTH(text) AS n_chars,
           CAST(list_sum(list_transform({_W}, w -> len(w))) AS DOUBLE)
             / len({_W}) AS avg_word_len,
           CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
             / LENGTH(text) AS punct_ratio,
           CAST({duck_in_set(STOPWORDS, _W)} AS DOUBLE) / len({_W}) AS stopword_ratio,
           0.4 * LEAST(CAST(len({_W}) AS DOUBLE) / 100, 1.0)
             + 0.3 * (1 - CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / LENGTH(text))
             + 0.3 * (1 - CAST({duck_in_set(STOPWORDS, _W)} AS DOUBLE) / len({_W})) AS quality_score
    FROM documents
    WHERE len({_W}) > 0
    """,
    doc="Document quality scoring: word/char counts, average word "
    "length, punctuation ratio, stopword ratio, combined score. "
    "Shuffle-free full scan.",
    tags=("text",),
)
def q30_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    nw = word_count("text")
    punct = (
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", ""))
        ).cast("double")
        / F.length("text")
    )
    stop = count_in_set("text", STOPWORDS).cast("double") / nw
    return (
        docs.where(nw > 0)
        .select(
            "doc_id",
            nw.alias("n_words"),
            F.length("text").cast("long").alias("n_chars"),
            (sum_word_lengths("text").cast("double") / nw).alias("avg_word_len"),
            punct.alias("punct_ratio"),
            stop.alias("stopword_ratio"),
            (
                F.lit(0.4) * F.least(nw.cast("double") / 100, F.lit(1.0))
                + F.lit(0.3) * (F.lit(1) - punct)
                + F.lit(0.3) * (F.lit(1) - stop)
            ).alias("quality_score"),
        )
    )


@REG.add(
    "q31_token_count",
    f"""
    SELECT doc_id,
           len({_W}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_bpe_tokens,
           CAST(LENGTH(text) AS DOUBLE)
             / len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS chars_per_token
    FROM documents
    WHERE len(regexp_extract_all(text, '{TOKEN_REGEX}')) > 0
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex tokens "
    "(letter runs / digit runs / punct runs) + chars-per-token.",
    tags=("text",),
)
def q31_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bpe = F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).cast(
        "long"
    )
    return (
        docs.select(
            "doc_id",
            word_count("text").alias("n_ws_tokens"),
            bpe.alias("n_bpe_tokens"),
            (F.length("text").cast("double") / bpe).alias("chars_per_token"),
        )
        .where(F.col("n_bpe_tokens") > 0)
    )


def _duck_lang_score() -> str:
    cases = []
    for lang, markers in LANG_MARKERS.items():
        cases.append(f"{duck_in_set(markers, _W)} AS score_{lang}")
    return ", ".join(cases)


@REG.add(
    "q32_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang, {_duck_lang_score()}
      FROM documents
    ), best AS (
      SELECT doc_id, labeled_lang,
             CASE GREATEST(score_en, score_de, score_fr, score_es, score_zh)
               WHEN 0 THEN 'und'
               WHEN score_en THEN 'en'
               WHEN score_de THEN 'de'
               WHEN score_fr THEN 'fr'
               WHEN score_es THEN 'es'
               ELSE 'zh' END AS predicted_lang
      FROM scored
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
    FROM best GROUP BY labeled_lang, predicted_lang
    """,
    doc="Language-ID heuristic (marker-word scores, first-wins "
    "tie-break en>de>fr>es>zh) + confusion matrix vs the labeled lang.",
    tags=("text",),
)
def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scores = {
        lang: count_in_set("text", markers)
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lang in ("en", "de", "fr", "es", "zh"):
        pred = pred.when(scores[lang] == best, lang)
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            pred.alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@REG.add(
    "q33_fingerprint",
    f"""
    SELECT doc_id,
           md5(LOWER(TRIM(REGEXP_REPLACE(text, ' +', ' ', 'g')))) AS content_fp,
           md5(array_to_string(list_sort(list_distinct({_W})), ' ')) AS bag_fp
    FROM documents
    """,
    doc="Document fingerprinting: md5 of whitespace-normalized content "
    "+ order-insensitive bag-of-words fingerprint (T19-style schema "
    "registry keys for text).",
    tags=("text", "hash"),
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return docs.select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", " +", " ")))
        ).alias("content_fp"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(words("text"))), " ")
        ).alias("bag_fp"),
    )
