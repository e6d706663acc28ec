"""Text-analysis functions over the documents table — language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Everything is a JVM-side column expression (whole-stage codegen; zero
Python), and every formula is chosen to be exactly reproducible in ANSI SQL:
integer counts, int/int divisions, and identical double expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc counting stats + quality score.

    quality = 0.5 * stopword_ratio + 0.5 * vowel_ratio — a deterministic
    (if simplistic) fluency proxy; length penalties applied as flags."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col("text"))
    vowels = n_chars - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
    stops = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    avg_word_len = (n_chars - (n_words - F.lit(1))) / n_words
    vowel_ratio = vowels / n_chars
    stop_ratio = stops / n_words
    quality = F.lit(0.5) * stop_ratio + F.lit(0.5) * vowel_ratio
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.alias("n_words"),
        vowels.alias("n_vowels"),
        stops.alias("n_stopwords"),
        avg_word_len.alias("avg_word_len"),
        vowel_ratio.alias("vowel_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
        (n_words >= 20).alias("len_ok"),
    )


def lang_guess(docs: DataFrame) -> DataFrame:
    """Character-class n-gram-free language heuristic: a deterministic CASE
    over vowel ratio and average word length (the real-data version would
    use char-trigram profiles; the *shape* — pure column expr, no UDF — is
    the point)."""
    s = text_stats(docs)
    guess = (
        F.when((F.col("vowel_ratio") >= 0.31) & (F.col("avg_word_len") < 4.6), F.lit("es"))
        .when(F.col("vowel_ratio") >= 0.33, F.lit("fr"))
        .when(F.col("avg_word_len") >= 5.2, F.lit("de"))
        .when(F.col("stop_ratio") >= 0.2, F.lit("en"))
        .otherwise(F.lit("other"))
    )
    return s.select("doc_id", guess.alias("lang_guess"))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate: ceil(chars-without-
    spaces / 4) per the usual ~4-chars-per-token rule — exact ints."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars_nospace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    bpe_est = F.ceil(n_chars_nospace / F.lit(4.0)).cast("long")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.alias("ws_tokens"),
        n_chars_nospace.alias("n_chars_nospace"),
        bpe_est.alias("bpe_tokens_est"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Position-weighted rolling fingerprint over word ids — all int64,
    exact: fp = sum over positions p (1-based) of
    word_id(p) * ((p * 2654435761) % 1000003), where
    word_id = length(word) * 1000 + ascii(first char)."""
    words = F.split(F.col("text"), " ")
    terms = F.transform(
        words,
        lambda w, i: (F.length(w) * F.lit(1000) + F.ascii(F.substring(w, 1, 1))).cast("long")
        * F.pmod((i.cast("long") + 1) * F.lit(2654435761), F.lit(1000003)),
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"), fp.alias("fp"))


def lang_id_trigram(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Char-trigram language ID: per-language profiles = the ``top_n`` most
    frequent trigrams of that language's labeled docs (trained on the table
    itself); a doc is classified to the language whose profile its trigram
    multiset hits most (ties -> lexicographically smallest language).

    Entirely DataFrame ops: trigram explode -> profile ranking (window) ->
    broadcast membership join -> per-doc argmax. Deterministic and exact
    (integer hit counts)."""
    from pyspark.sql.window import Window

    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
        ).alias("tri"),
    )
    profile = (
        grams.groupBy("lang", "tri")
        .count()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("count").desc(), F.col("tri").asc())
            ),
        )
        .filter(F.col("rn") <= top_n)
        .select(F.col("lang").alias("profile_lang"), "tri")
    )
    hits = (
        grams.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("profile_lang").asc())
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("profile_lang").alias("lang_pred"), "hits")
    )
