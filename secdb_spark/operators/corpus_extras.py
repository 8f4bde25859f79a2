"""Round-7 additions, batch 10 — readability scoring, token-length
profile.

Reference semantics: SURVEY §2 extension policy (mount empty) — two more
corpus-quality gates in the Gopher/CCNet family (text_quality /
text_repetition / text_ttr siblings): a Flesch-style readability score
per document, and the corpus token-length distribution per language.
Both follow the family's scale rule: regexp counting fused into the
scan (map-only, zero Exchange for the per-doc op), then combinable
aggregates on model-sized keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import table
from ..registry import register
from ._helpers import r4

# ---------------------------------------------------------------------------
# text_readability — Flesch reading-ease per document
# ---------------------------------------------------------------------------

WORD_RE = r"\S+"
SENT_RE = r"[.!?]+"
SYLL_RE = r"[aeiouy]+"


@register(
    "text_readability",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
             greatest(1, len(regexp_extract_all(text, '{SENT_RE}')))
               AS n_sents,
             greatest(1, len(regexp_extract_all(lower(text), '{SYLL_RE}')))
               AS n_syll
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_syll AS BIGINT) AS n_syll,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                 - 84.6 * (CAST(n_syll AS DOUBLE) / greatest(1, n_words)),
                 4) AS flesch
    FROM c
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document: 206.835 - 1.015·(words/sentence)
    - 84.6·(syllables/word), with syllables approximated as vowel-group
    runs (the standard dictionary-free estimator) and sentences as
    terminal-punctuation runs.  All three counts are exact integers from
    JVM regexp_extract_all fused into the parquet scan — the whole op is
    map-only, zero Exchange, and embarrassingly parallel at any corpus
    size; the score is one shared IEEE tree over exact integers.
    Degenerate docs guard through greatest(1, ·) on both engines."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD_RE), 0))
    n_sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit(SENT_RE), 0))
    )
    n_syll = F.greatest(
        F.lit(1),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(SYLL_RE), 0)
        ),
    )
    c = d.select(
        "doc_id",
        "lang",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syll"),
    )
    return c.select(
        "doc_id",
        "lang",
        "n_words",
        "n_sents",
        "n_syll",
        r4(
            F.lit(206.835)
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sents"))
            - 84.6
            * (
                F.col("n_syll").cast("double")
                / F.greatest(F.lit(1), F.col("n_words"))
            )
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# corpus_word_len_dist — token-length histogram per language
# ---------------------------------------------------------------------------

@register(
    "corpus_word_len_dist",
    oracle="""
    WITH t AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), f AS (
      SELECT lang, least(20, CAST(length(tok) AS INT)) AS wl
      FROM t WHERE tok <> ''
    ), h AS (
      SELECT lang, wl, CAST(count(*) AS BIGINT) AS n
      FROM f GROUP BY 1, 2
    )
    SELECT lang, wl, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 4)
             AS share
    FROM h
    """,
)
def corpus_word_len_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram per language (lengths capped at 20 — the
    tokenizer-sanity profile: a language whose mass sits at the cap is
    unsegmented or mis-identified).  Tokens come from the package's
    shared whitespace convention (split(lower(text), ' ')); the explode
    feeds one combinable aggregate on the |langs| x 20 key, so every
    partition reduces to the model-sized histogram before the single
    Exchange.  The share divides exact counts over the model-sized
    aggregate (allowlisted window)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = toks.select(
        "lang",
        F.least(F.lit(20), F.length("tok")).cast("int").alias("wl"),
    ).groupBy("lang", "wl").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("lang")
    return h.select(
        "lang",
        "wl",
        "n",
        r4(F.col("n").cast("double") / F.sum("n").over(wt)).alias("share"),
    )
