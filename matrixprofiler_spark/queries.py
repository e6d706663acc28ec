"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a DuckDB-runnable ANSI-SQL oracle where SQL can express the semantics.

Exactness design (why these hashes match bit-for-bit, no rounding):
* token values are small ints; sliding sums / sumsq / dot products are
  exact int64 in the kernels AND exact in SQL (integer-valued doubles below
  2^53 sum exactly in any order);
* w = 8 (power of two) makes mean = sum/8 an exact double division;
* every derived double (std, sig, distances, cosine) is written as the
  SAME IEEE-754 expression tree on both sides — identical ops on identical
  inputs give identical bits;
* ties are always broken by an explicit secondary sort key.

The word->token map (length(w)*1000 + ascii(first char)) is the
DuckDB-replicable tokenizer of sources/tokens.py.

Operators that SQL cannot express (FFT MASS, STOMP recurrence, MPX
diagonals, SCRIMP, contrast, simhash) are exposed as rows-only queries
running the real golden-tested kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.text import fingerprint, lang_guess, text_stats, token_counts
from .operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .operators.rollup import cascade_tier, finest_rollup, gap_fill
from .operators.similarity import cosine_pairs_above, cosine_topk
from .operators.windows import (
    mass_profile_exact,
    matrix_profile_exact,
    sliding_stats,
    zero_crossings,
)
from .sources.tokens import synth_tokens_df, tokens_from_documents

W = 8  # power of two -> exact mean division
ZC_W = 16
BUCKET = 16
BUCKET_COARSE = 64

# ---------------------------------------------------------------- SQL CTEs

TOK_CTE = """
tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         [length(w) * 1000 + ascii(substr(w, 1, 1)) FOR w IN string_split(text, ' ')] AS tokens
  FROM documents
),
pos AS (
  SELECT doc_id, source,
         UNNEST(tokens) AS tok,
         generate_subscripts(tokens, 1) AS pos,
         len(tokens) AS n_tok
  FROM tok
)
"""

WIN_CTE = f"""
win AS (
  SELECT doc_id, CAST(pos - {W} AS INT) AS off,
         CAST(SUM(tok) OVER w AS BIGINT) AS s,
         CAST(SUM(tok * tok) OVER w AS BIGINT) AS s2,
         CAST(MIN(tok) OVER w AS INT) AS mn,
         CAST(MAX(tok) OVER w AS INT) AS mx
  FROM pos
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
  QUALIFY pos >= {W}
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens_from_documents(spark, sf_dir)


# ---------------------------------------------------------------- queries

def q_rollup_1m(spark, sf_dir):
    r = finest_rollup(_tok(spark, sf_dir), BUCKET)
    return r.select("doc_id", "bucket", "cnt", "sum_v", "sumsq", "min_v", "max_v")


SQL_ROLLUP_1M = f"""
WITH {TOK_CTE}
SELECT doc_id, CAST((pos - 1) // {BUCKET} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(tok) AS BIGINT) AS sum_v,
       CAST(SUM(tok * tok) AS BIGINT) AS sumsq,
       CAST(MIN(tok) AS INT) AS min_v,
       CAST(MAX(tok) AS INT) AS max_v
FROM pos GROUP BY 1, 2
"""


def q_rollup_cascade(spark, sf_dir):
    m1 = finest_rollup(_tok(spark, sf_dir), BUCKET)
    h1 = cascade_tier(m1, BUCKET, BUCKET_COARSE, "1h")
    return h1.select("doc_id", "bucket", "cnt", "sum_v", "sumsq", "min_v", "max_v")


SQL_ROLLUP_CASCADE = SQL_ROLLUP_1M.replace(f"// {BUCKET} ", f"// {BUCKET_COARSE} ")


def q_gapfill(spark, sf_dir):
    m1 = finest_rollup(_tok(spark, sf_dir), BUCKET)
    holey = m1.filter(F.pmod(F.col("bucket"), F.lit(5)) != 3)
    filled = gap_fill(holey)
    return filled.select("doc_id", "bucket", "filled", "cnt", "sum_v")


SQL_GAPFILL = f"""
WITH {TOK_CTE},
r AS (
  SELECT doc_id, (pos - 1) // {BUCKET} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(tok) AS BIGINT) AS sum_v
  FROM pos GROUP BY 1, 2
  HAVING (bucket % 5) != 3
),
mx AS (SELECT doc_id, MAX(bucket) AS mb FROM r GROUP BY 1),
spine AS (SELECT doc_id, UNNEST(range(0, mb + 1)) AS bucket FROM mx)
SELECT s.doc_id, CAST(s.bucket AS BIGINT) AS bucket,
       r.doc_id IS NULL AS filled,
       COALESCE(r.cnt, 0) AS cnt, COALESCE(r.sum_v, 0) AS sum_v
FROM spine s LEFT JOIN r ON s.doc_id = r.doc_id AND s.bucket = r.bucket
"""


def q_sliding_stats(spark, sf_dir):
    s = sliding_stats(_tok(spark, sf_dir), W)
    # mov_var (ogita): (sumsq/w) - mean*mean, src/windowfunc.cpp:87-94
    s = s.withColumn("var", F.col("sumsq") / W - F.col("mean") * F.col("mean"))
    # NULL sig on zero-variance windows (exact integer test), matching SQL
    zero_var = F.col("sumsq") * W == F.col("sum_v") * F.col("sum_v")
    return s.withColumn("sig", F.when(zero_var, F.lit(None)).otherwise(F.col("sig")))


SQL_SLIDING_STATS = f"""
WITH {TOK_CTE}, {WIN_CTE}
SELECT doc_id, off,
       s AS sum_v,
       s2 AS sumsq,
       s / {W}.0 AS mean,
       s2 / {W}.0 - (s / {W}.0) * (s / {W}.0) AS var,
       sqrt(s2 / {W}.0 - (s / {W}.0) * (s / {W}.0)) AS std,
       CASE WHEN s2 * {W} = s * s THEN NULL
            ELSE 1.0 / sqrt(s2 - (s / {W}.0) * (s / {W}.0) * {W}) END AS sig,
       mn AS min_v, mx AS max_v
FROM win
"""


def q_zero_crossings(spark, sf_dir):
    return zero_crossings(_tok(spark, sf_dir), ZC_W)


SQL_ZERO_CROSSINGS = f"""
WITH {TOK_CTE},
docstats AS (
  SELECT doc_id, SUM(tok) / CAST(n_tok AS DOUBLE) AS m, n_tok
  FROM pos GROUP BY doc_id, n_tok
),
ind AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN (p.tok - d.m) * (LAG(p.tok) OVER (PARTITION BY p.doc_id ORDER BY p.pos) - d.m) < 0
              THEN 1 ELSE 0 END AS c
  FROM pos p JOIN docstats d USING (doc_id)
),
roll AS (
  SELECT doc_id, pos,
         CAST(SUM(c) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND {ZC_W - 3} FOLLOWING) AS INT) AS crossings
  FROM ind
)
SELECT r.doc_id, CAST(r.pos - 2 AS INT) AS off, r.crossings
FROM roll r JOIN docstats d USING (doc_id)
WHERE r.pos >= 2 AND r.pos - 2 <= d.n_tok - {ZC_W}
"""


def q_complexity(spark, sf_dir):
    """CID complexity per doc (R/math.R:179-181) — exact int diff sumsq.

    Docs with a single token have no diffs; the oracle's WHERE df IS NOT
    NULL drops them, so filter n_tok > 1 here too (row-set agreement)."""
    t = _tok(spark, sf_dir).filter(F.size("tokens") > 1)
    diffs = F.transform(
        F.slice(F.col("tokens"), 2, F.size("tokens") - 1),
        lambda x, i: (x.cast("long") - F.element_at(F.col("tokens"), i + 1).cast("long")),
    )
    ss = F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, d: acc + d * d)
    return t.select("doc_id", F.sqrt(ss).alias("complexity"))


SQL_COMPLEXITY = f"""
WITH {TOK_CTE},
d AS (
  SELECT doc_id,
         tok - LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS df
  FROM pos
)
SELECT doc_id, sqrt(CAST(SUM(df * df) AS BIGINT)) AS complexity
FROM d WHERE df IS NOT NULL GROUP BY doc_id
"""


def q_doc_znorm_stats(spark, sf_dir):
    """Per-doc mean / population-std (exact int sums) + the znorm
    low-variance branch flag (sd <= 0.01, src/mathtools.cpp:123)."""
    p = _tok(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("tok"), F.size("tokens").alias("n")
    )
    g = p.groupBy("doc_id", "n").agg(
        F.sum(F.col("tok").cast("long")).alias("s"),
        F.sum((F.col("tok") * F.col("tok")).cast("long")).alias("s2"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    return g.select(
        "doc_id", mean.alias("mean"), std.alias("std"),
        (std <= 0.01).alias("low_var"),
    )


SQL_DOC_ZNORM_STATS = f"""
WITH {TOK_CTE},
g AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
         CAST(SUM(tok) AS BIGINT) AS s, CAST(SUM(tok * tok) AS BIGINT) AS s2
  FROM pos GROUP BY doc_id, n_tok
)
SELECT doc_id, s / CAST(n AS DOUBLE) AS mean,
       sqrt(s2 / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS std,
       sqrt(s2 / CAST(n AS DOUBLE) - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) <= 0.01 AS low_var
FROM g
"""


def q_mode_token(spark, sf_dir):
    """Most frequent token per doc (mode, src/mathtools.cpp:101-107); ties
    -> smallest token (deterministic oracle tie-break)."""
    from pyspark.sql.window import Window

    p = _tok(spark, sf_dir).select("doc_id", F.explode("tokens").alias("tok"))
    cnt = p.groupBy("doc_id", "tok").count()
    w = Window.partitionBy("doc_id").orderBy(F.col("count").desc(), F.col("tok").asc())
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("mode_tok"), F.col("count").alias("freq"))
    )


SQL_MODE_TOKEN = f"""
WITH {TOK_CTE},
cnt AS (SELECT doc_id, tok, COUNT(*) AS freq FROM pos GROUP BY 1, 2),
rk AS (SELECT doc_id, tok, freq,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY freq DESC, tok ASC) AS rn FROM cnt)
SELECT doc_id, CAST(tok AS INT) AS mode_tok, freq FROM rk WHERE rn = 1
"""


def q_mass_w8(spark, sf_dir):
    return mass_profile_exact(_tok(spark, sf_dir), W, query_off=0)


SQL_MASS_W8 = f"""
WITH {TOK_CTE}, {WIN_CTE},
stats AS (
  SELECT doc_id, off, s / {W}.0 AS mu,
         sqrt(s2 / {W}.0 - (s / {W}.0) * (s / {W}.0)) AS sd
  FROM win
),
prod AS (  -- q is the window at off 0: positions 1..{W}
  SELECT a.doc_id, b.pos - a.pos AS shift, a.tok * b.tok AS p
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND a.pos <= {W} AND b.pos - a.pos >= 0
  WHERE b.pos - a.pos <= b.n_tok - {W}
),
qt AS (SELECT doc_id, shift AS off, CAST(SUM(p) AS BIGINT) AS qt
       FROM prod GROUP BY 1, 2 HAVING COUNT(*) = {W})
SELECT q.doc_id, CAST(q.off AS INT) AS off,
       GREATEST(2 * ({W} - (q.qt - {W} * sq.mu * sd.mu) / (sq.sd * sd.sd)), 0) AS dist
FROM qt q
JOIN stats sq ON sq.doc_id = q.doc_id AND sq.off = 0
JOIN stats sd ON sd.doc_id = q.doc_id AND sd.off = q.off
WHERE sq.sd > 0 AND sd.sd > 0
"""


def q_matrix_profile_w8(spark, sf_dir):
    return matrix_profile_exact(_tok(spark, sf_dir), W, ez=0.5)


_EZ = 4  # round(8 * 0.5 + eps), src/stomp.cpp:29

SQL_MATRIX_PROFILE_W8 = f"""
WITH {TOK_CTE}, {WIN_CTE},
stats AS (
  SELECT doc_id, off, s / {W}.0 AS mu,
         sqrt(s2 / {W}.0 - (s / {W}.0) * (s / {W}.0)) AS sd
  FROM win JOIN (SELECT doc_id AS d2, n_tok FROM pos GROUP BY 1, 2) n
    ON win.doc_id = n.d2
  WHERE n.n_tok >= 2 * {W}
),
prod AS (
  SELECT a.doc_id, b.pos - a.pos AS diag, a.pos, a.tok * b.tok AS p
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND b.pos - a.pos > {_EZ}
  WHERE a.n_tok >= 2 * {W}
),
qt AS (
  SELECT doc_id, diag, CAST(pos - {W} AS INT) AS o1,
         CAST(SUM(p) OVER (PARTITION BY doc_id, diag ORDER BY pos
              ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS qt,
         COUNT(*) OVER (PARTITION BY doc_id, diag ORDER BY pos
              ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS k
  FROM prod
  QUALIFY k = {W} AND pos >= {W}
),
cand AS (
  SELECT doc_id, o1 AS off, o1 + diag AS nn, qt FROM qt
  UNION ALL
  SELECT doc_id, o1 + diag AS off, o1 AS nn, qt FROM qt
),
dist AS (
  SELECT c.doc_id, c.off, c.nn,
         GREATEST(2 * ({W} - (c.qt - {W} * so.mu * sn.mu) / (so.sd * sn.sd)), 0) AS d
  FROM cand c
  JOIN stats so ON so.doc_id = c.doc_id AND so.off = c.off
  JOIN stats sn ON sn.doc_id = c.doc_id AND sn.off = c.nn
  WHERE so.sd > 0 AND sn.sd > 0
),
best AS (
  SELECT doc_id, off, nn, d,
         ROW_NUMBER() OVER (PARTITION BY doc_id, off ORDER BY d ASC, nn ASC) AS rn
  FROM dist
)
SELECT doc_id, CAST(off AS INT) AS off, sqrt(d) AS mp, CAST(nn AS INT) AS nn_off
FROM best WHERE rn = 1
"""


# -------------------------------------------------- training-data pipeline

def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM documents GROUP BY 1
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


SQL_DEDUP_NGRAM_JACCARD = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, string_split(text, ' ') AS words
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source,
         UNNEST([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                 FOR i IN range(1, len(words) - 1)]) AS gram
  FROM w
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.source = b.source
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.common,
       CAST(sa.n_grams AS BIGINT) AS na, CAST(sb.n_grams AS BIGINT) AS nb,
       p.common / CAST(sa.n_grams + sb.n_grams - p.common AS DOUBLE) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.common / CAST(sa.n_grams + sb.n_grams - p.common AS DOUBLE) >= 0.2
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir), n=3, num_hashes=8, band_size=2)


SQL_DEDUP_MINHASH_LSH = """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         UNNEST([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                 FOR i IN range(1, len(words) - 1)]) AS gram
  FROM w
),
sig AS (
  SELECT doc_id,
         MIN(md5(gram || '#0')) AS mh0, MIN(md5(gram || '#1')) AS mh1,
         MIN(md5(gram || '#2')) AS mh2, MIN(md5(gram || '#3')) AS mh3,
         MIN(md5(gram || '#4')) AS mh4, MIN(md5(gram || '#5')) AS mh5,
         MIN(md5(gram || '#6')) AS mh6, MIN(md5(gram || '#7')) AS mh7
  FROM grams GROUP BY 1
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bucket FROM sig UNION ALL
  SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig UNION ALL
  SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig UNION ALL
  SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs — rows-only check (xxhash64 has no portable
    SQL equivalent; the operator itself is golden-tested via determinism)."""
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=20)


def q_ann_topk(spark, sf_dir):
    return cosine_topk(_emb(spark, sf_dir), k=3, num_queries=20)


SQL_ANN_TOPK = """
WITH qv AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         [CAST(round(CAST(e AS DOUBLE) * 10000, 0) AS BIGINT) FOR e IN embedding] AS q
  FROM embeddings
),
nq AS (SELECT vec_id, q, CAST(list_sum([x * x FOR x IN q]) AS BIGINT) AS norm2 FROM qv),
pairs AS (
  SELECT a.vec_id AS q_id, b.vec_id AS nn_id,
         CAST(list_sum(list_transform(list_zip(a.q, b.q), t -> t[1] * t[2])) AS BIGINT) AS dot,
         a.norm2 AS qn, b.norm2 AS bn
  FROM nq a JOIN nq b ON a.vec_id < 20 AND a.vec_id != b.vec_id
),
rk AS (
  SELECT q_id, nn_id, dot / (sqrt(qn) * sqrt(bn)) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY dot / (sqrt(qn) * sqrt(bn)) DESC, nn_id ASC) AS rank
  FROM pairs
)
SELECT q_id, nn_id, CAST(rank AS INT) AS rank, cos FROM rk WHERE rank <= 3
"""


def q_embedding_near_dups(spark, sf_dir):
    return cosine_pairs_above(_emb(spark, sf_dir), threshold=0.2)


SQL_EMBEDDING_NEAR_DUPS = """
WITH qv AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         [CAST(round(CAST(e AS DOUBLE) * 10000, 0) AS BIGINT) FOR e IN embedding] AS q
  FROM embeddings
),
nq AS (SELECT vec_id, q, CAST(list_sum([x * x FOR x IN q]) AS BIGINT) AS norm2 FROM qv)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(list_sum(list_transform(list_zip(a.q, b.q), t -> t[1] * t[2])) AS BIGINT)
         / (sqrt(a.norm2) * sqrt(b.norm2)) AS cos
FROM nq a JOIN nq b ON a.vec_id < b.vec_id
WHERE CAST(list_sum(list_transform(list_zip(a.q, b.q), t -> t[1] * t[2])) AS BIGINT)
      / (sqrt(a.norm2) * sqrt(b.norm2)) >= 0.2
"""


def q_text_stats(spark, sf_dir):
    return text_stats(_docs(spark, sf_dir))


SQL_TEXT_STATS = """
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         len(string_split(text, ' ')) AS n_words,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the','a','of','and','to','in','is','it'))) AS n_stopwords
  FROM documents
)
SELECT doc_id, CAST(n_words AS INT) AS n_words, CAST(n_vowels AS INT) AS n_vowels,
       CAST(n_stopwords AS INT) AS n_stopwords,
       (n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE) AS avg_word_len,
       n_vowels / CAST(n_chars AS DOUBLE) AS vowel_ratio,
       n_stopwords / CAST(n_words AS DOUBLE) AS stop_ratio,
       0.5 * (n_stopwords / CAST(n_words AS DOUBLE)) + 0.5 * (n_vowels / CAST(n_chars AS DOUBLE)) AS quality,
       n_words >= 20 AS len_ok
FROM s
"""


def q_lang_guess(spark, sf_dir):
    return lang_guess(_docs(spark, sf_dir))


SQL_LANG_GUESS = """
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         len(string_split(text, ' ')) AS n_words, length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the','a','of','and','to','in','is','it'))) AS n_stopwords
  FROM documents
),
r AS (
  SELECT doc_id,
         n_vowels / CAST(n_chars AS DOUBLE) AS vowel_ratio,
         (n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE) AS avg_word_len,
         n_stopwords / CAST(n_words AS DOUBLE) AS stop_ratio
  FROM s
)
SELECT doc_id,
       CASE WHEN vowel_ratio >= 0.31 AND avg_word_len < 4.6 THEN 'es'
            WHEN vowel_ratio >= 0.33 THEN 'fr'
            WHEN avg_word_len >= 5.2 THEN 'de'
            WHEN stop_ratio >= 0.2 THEN 'en'
            ELSE 'other' END AS lang_guess
FROM r
"""


def q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir))


SQL_TOKEN_COUNTS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(length(replace(text, ' ', '')) AS INT) AS n_chars_nospace,
       CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS bpe_tokens_est
FROM documents
"""


def q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


SQL_FINGERPRINT = """
WITH w AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS words
  FROM documents
)
SELECT doc_id,
       CAST(list_sum([
         (length(words[i]) * 1000 + ascii(substr(words[i], 1, 1)))::BIGINT
           * ((i * 2654435761) % 1000003)
         FOR i IN range(1, len(words) + 1)
       ]) AS BIGINT) AS fp
FROM w
"""


# ----------------------------------------------- rows-only kernel queries

_MP_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("off", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("idx", T.IntegerType()),
    ]
)


def _kernel_query(fn_name: str, w: int):
    """Run a real MP kernel per doc over the synthetic tokens table
    (includes the embedded 875-pt reference doc) — rows-only check."""

    def run(spark, sf_dir):
        from .kernels import mass, mass_pre, mpx, scrimp, stamp, stomp

        toks = synth_tokens_df(spark, 24, seed=42)

        def kernel(batches):
            for b in batches:
                parts = []
                for doc_id, t in zip(b["doc_id"], b["tokens"]):
                    x = np.asarray(t, dtype=np.float64)[:2000]
                    if x.size < 2 * w:
                        continue
                    if fn_name == "stomp":
                        r = stomp(x, w)
                        val, idx = r["matrix_profile"], r["profile_index"]
                    elif fn_name == "stamp":
                        r = stamp(x, w)
                        val, idx = r["matrix_profile"], r["profile_index"]
                    elif fn_name == "scrimp":
                        r = scrimp(x, w)
                        val, idx = r["matrix_profile"], r["profile_index"]
                    elif fn_name == "mpx":
                        r = mpx(x, w)
                        val, idx = r["matrix_profile"], r["profile_index"]
                    elif fn_name == "mass":
                        pre = mass_pre(x, w)
                        r = mass(pre, x, index=1)
                        val = r["distance_profile"]
                        idx = np.zeros(val.size, dtype=np.int32)
                    else:
                        raise ValueError(fn_name)
                    val = np.asarray(val, dtype=np.float64)
                    finite = np.isfinite(val)
                    parts.append(
                        pd.DataFrame(
                            {
                                "doc_id": doc_id,
                                "off": np.arange(val.size, dtype=np.int32)[finite],
                                "value": val[finite],
                                "idx": np.asarray(idx, dtype=np.int32)[finite],
                            }
                        )
                    )
                yield (
                    pd.concat(parts, ignore_index=True)
                    if parts
                    else pd.DataFrame({f.name: pd.Series(dtype=object) for f in _MP_ROWS_SCHEMA.fields})
                )

        return toks.mapInPandas(kernel, schema=_MP_ROWS_SCHEMA)

    return run




def q_normalize_params(spark, sf_dir):
    """normalize() rescale factors per doc (src/mathtools.cpp:131-143):
    a = (max_lim - min_lim)/(max - min), b = max_lim - a*max, plus how many
    positions clip — the whole affine map, verified without exploding."""
    t = _tok(spark, sf_dir)
    mx = F.array_max("tokens").cast("double")
    mn = F.array_min("tokens").cast("double")
    a = (F.lit(5.0) - F.lit(1.0)) / (mx - mn)
    bb = F.lit(5.0) - a * mx
    return t.select(
        "doc_id",
        a.alias("a"),
        bb.alias("b"),
        F.size(F.filter(F.col("tokens"), lambda x: a * x.cast("double") + bb > 5.0)).alias("n_clip_hi"),
    )


SQL_NORMALIZE_PARAMS = f"""
WITH {TOK_CTE},
g AS (
  SELECT doc_id, CAST(MAX(tok) AS DOUBLE) AS mx, CAST(MIN(tok) AS DOUBLE) AS mn,
         COUNT(*) AS n
  FROM pos GROUP BY 1
),
p AS (
  SELECT doc_id, (5.0 - 1.0) / (mx - mn) AS a, 5.0 - ((5.0 - 1.0) / (mx - mn)) * mx AS b
  FROM g
)
SELECT p.doc_id, p.a, p.b,
       CAST(COUNT(*) FILTER (WHERE p.a * pos.tok + p.b > 5.0) AS INT) AS n_clip_hi
FROM p JOIN pos ON pos.doc_id = p.doc_id
GROUP BY 1, 2, 3
"""


def q_ed_corr(spark, sf_dir):
    """ed_corr/corr_ed conversion pair (src/mathtools.cpp:191-204) applied
    to the matrix-profile distances; roundtrip must return the input where
    corr <= 1."""
    mp = matrix_profile_exact(_tok(spark, sf_dir), W, ez=0.5)
    corr = (F.lit(2 * W) - F.col("mp") * F.col("mp")) / F.lit(2 * W)
    back = F.sqrt(F.lit(2 * W) * (F.lit(1.0) - F.when(corr > 1, F.lit(1.0)).otherwise(corr)))
    return mp.select("doc_id", "off", corr.alias("corr"), back.alias("ed_back"))


SQL_ED_CORR = (
    SQL_MATRIX_PROFILE_W8.rstrip()
    .replace("SELECT doc_id, CAST(off AS INT) AS off, sqrt(d) AS mp, CAST(nn AS INT) AS nn_off\nFROM best WHERE rn = 1",
             """SELECT doc_id, CAST(off AS INT) AS off,
       (16 - sqrt(d) * sqrt(d)) / 16 AS corr,
       sqrt(16 * (1.0 - CASE WHEN (16 - sqrt(d) * sqrt(d)) / 16 > 1
                             THEN 1.0 ELSE (16 - sqrt(d) * sqrt(d)) / 16 END)) AS ed_back
FROM best WHERE rn = 1""")
)


_BSPLIT_SCHEMA = T.StructType(
    [T.StructField("pos", T.IntegerType()), T.StructField("idx", T.IntegerType())]
)


def q_binary_split(spark, sf_dir):
    """binary_split(200) anytime visit order (src/mathtools.cpp:146-188) —
    rows-only (driver-side ordering helper, golden-tested vs snapshot)."""
    from .kernels import binary_split

    order = binary_split(200)
    return spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(order)], schema=_BSPLIT_SCHEMA
    )


def _mov_variants_query(spark, sf_dir):
    """mov_sum/mean/var weighted + fading variants (recursive exponential
    windows, src/windowfunc.cpp:286-450) — not SQL-expressible; rows-only."""
    from .kernels import movmean, movsum, movvar

    toks = synth_tokens_df(spark, 16, seed=42)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("off", T.IntegerType()),
            T.StructField("sum_weighted", T.DoubleType()),
            T.StructField("sum_fading", T.DoubleType()),
            T.StructField("mean_weighted", T.DoubleType()),
            T.StructField("mean_fading", T.DoubleType()),
            T.StructField("var_weighted", T.DoubleType()),
            T.StructField("var_fading", T.DoubleType()),
        ]
    )

    def kernel(batches):
        w = 64
        for b in batches:
            parts = []
            for doc_id, t in zip(b["doc_id"], b["tokens"]):
                x = np.asarray(t, dtype=np.float64)[:1000]
                if x.size < w:
                    continue
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": doc_id,
                            "off": np.arange(x.size - w + 1, dtype=np.int32),
                            "sum_weighted": movsum(x, w, "weighted"),
                            "sum_fading": movsum(x, w, "fading"),
                            "mean_weighted": movmean(x, w, "weighted"),
                            "mean_fading": movmean(x, w, "fading"),
                            "var_weighted": movvar(x, w, "weighted"),
                            "var_fading": movvar(x, w, "fading"),
                        }
                    )
                )
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})
            )

    return toks.mapInPandas(kernel, schema=schema)


def _contrast_query(spark, sf_dir):
    """Contrast Profile (src/contrast.cpp:22-88) between consecutive synth
    doc pairs — rows-only (MPX-based composite)."""
    from .kernels import contrast

    toks = synth_tokens_df(spark, 8, seed=42, include_golden=False)

    schema = T.StructType(
        [
            T.StructField("pair_id", T.StringType()),
            T.StructField("off", T.IntegerType()),
            T.StructField("cp", T.DoubleType()),
            T.StructField("plato_idx", T.IntegerType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        w = 50
        rows = pdf.sort_values("doc_id").reset_index(drop=True)
        parts = []
        for i in range(0, len(rows) - 1, 2):
            neg = np.asarray(rows.loc[i, "tokens"], dtype=np.float64)[:800]
            pos = np.asarray(rows.loc[i + 1, "tokens"], dtype=np.float64)[:800]
            if neg.size < 2 * w or pos.size < 2 * w:
                continue
            r = contrast(neg, pos, w)
            cp = r["contrast_profile"]
            parts.append(
                pd.DataFrame(
                    {
                        "pair_id": f"{rows.loc[i, 'doc_id']}|{rows.loc[i + 1, 'doc_id']}",
                        "off": np.arange(cp.size, dtype=np.int32),
                        "cp": cp,
                        "plato_idx": np.int32(r["plato_idx"]),
                    }
                )
            )
        return (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})
        )

    return (
        toks.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: kernel(pdf).assign(), schema=schema)
    )


def _mpxab_query(spark, sf_dir):
    """MPX AB-join (src/mpx.cpp:999-1174) between consecutive synth docs —
    rows-only; sig>60 guard active."""
    from .kernels import mpxab

    toks = synth_tokens_df(spark, 8, seed=42, include_golden=False)

    schema = T.StructType(
        [
            T.StructField("pair_id", T.StringType()),
            T.StructField("off", T.IntegerType()),
            T.StructField("mp_a", T.DoubleType()),
            T.StructField("pi_a", T.IntegerType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        w = 64
        rows = pdf.sort_values("doc_id").reset_index(drop=True)
        parts = []
        for i in range(0, len(rows) - 1, 2):
            a = np.asarray(rows.loc[i, "tokens"], dtype=np.float64)[:1200]
            b = np.asarray(rows.loc[i + 1, "tokens"], dtype=np.float64)[:1200]
            if a.size < 2 * w or b.size < 2 * w:
                continue
            r = mpxab(a, b, w)
            mp = r["matrix_profile"]
            fin = np.isfinite(mp)
            parts.append(
                pd.DataFrame(
                    {
                        "pair_id": f"{rows.loc[i, 'doc_id']}|{rows.loc[i + 1, 'doc_id']}",
                        "off": np.arange(mp.size, dtype=np.int32)[fin],
                        "mp_a": mp[fin],
                        "pi_a": np.asarray(r["profile_index"], dtype=np.int32)[fin],
                    }
                )
            )
        return (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})
        )

    return (
        toks.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: kernel(pdf), schema=schema)
    )




def q_events_rollup(spark, sf_dir):
    """Event-time tumbling-window rollup over the events stream table —
    the same tier semantics applied to wall-clock time: per (user_id, 1h
    bucket): count / exact cents sum / min / max. Late-data handling in a
    live pipeline would be watermarked Structured Streaming; the batch
    semantics here are identical."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.withColumn("bucket", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


SQL_EVENTS_ROLLUP = """
SELECT user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(MIN(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(MAX(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY 1, 2
"""




def q_tier_blobs(spark, sf_dir):
    """Gorilla/DoD-compressed tier series per (doc, tier) — rows-only
    (binary columns; codec round-trip is unit-tested)."""
    from .operators.rollup import tier_blobs, tier_rollup

    roll = tier_rollup(_tok(spark, sf_dir)).filter(F.col("tier") == "1m")
    return tier_blobs(roll).select("doc_id", "tier", "n_buckets")


def q_image_features(spark, sf_dir):
    """Multimodal: image decode (deterministic stub) -> 8x8 resize ->
    perceptual hash + luminance stats — rows-only."""
    from .operators.multimodal import image_features, synth_media_df

    return image_features(synth_media_df(spark, 64)).select(
        "media_id", "mean_lum", "std_lum", "phash64"
    )


def q_audio_features(spark, sf_dir):
    """Multimodal: audio decode (stub) -> frame-sampled RMS — rows-only."""
    from .operators.multimodal import audio_features, synth_media_df

    return audio_features(synth_media_df(spark, 64)).select(
        "media_id", "duration_sec", "rms", "zero_crossing_rate"
    )


def q_srp_buckets(spark, sf_dir):
    """ANN scale path: sign-random-projection LSH bucket ids — rows-only."""
    from .operators.similarity import srp_bucketed_candidates

    return srp_bucketed_candidates(_emb(spark, sf_dir), n_planes=8)




def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary with exact-cents arithmetic
    (broadcastless single groupBy; doubles derived from exact int sums)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round(F.col("l_discount") * 100, 0).cast("long")
    disc_price = price * (F.lit(100) - disc)  # cents * percent-units
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty_c"),
            F.sum(price).alias("sum_price_c"),
            F.sum(disc_price).alias("sum_disc_price_cc"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty_c") / (F.col("count_order") * 100))
        .withColumn("avg_price", F.col("sum_price_c") / (F.col("count_order") * 100))
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS sum_disc_price_cc,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_qty,
       SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_tpch_top_customers(spark, sf_dir):
    """Revenue per customer via orders join (small dim broadcast), top 25 by
    exact cents with deterministic tie-break."""
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        orders.withColumn("cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("revenue_c"), F.count("*").alias("n_orders"))
    )
    joined = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("o_custkey").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
        .select(
            F.col("o_custkey").alias("custkey"), "c_name", "c_mktsegment",
            "revenue_c", "n_orders", F.col("rank").cast("int").alias("rank"),
        )
    )


SQL_TPCH_TOP_CUSTOMERS = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_c,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
rk AS (
  SELECT r.o_custkey AS custkey, c.c_name, c.c_mktsegment, r.revenue_c, r.n_orders,
         ROW_NUMBER() OVER (ORDER BY r.revenue_c DESC, r.o_custkey ASC) AS rank
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
)
SELECT custkey, c_name, c_mktsegment, revenue_c, n_orders, CAST(rank AS INT) AS rank
FROM rk WHERE rank <= 25
"""




def q_mp_blobs(spark, sf_dir):
    """Distributed per-doc MPX matrix profile, Gorilla/DoD-compressed.

    The profile VALUES are MPX floats (bit-exact vs reference goldens in
    pytest, not SQL-derivable), so the oracle face checks the structural
    contract: per-doc row, profile_len == n_tok - w + 1 for every doc long
    enough, explicit truncation flags (never silent), blob presence. The
    blob payloads themselves are covered by codec round-trip tests and the
    embedded reference-golden doc test."""
    from .operators.mp_ops import matrix_profile_blobs

    toks = _tok(spark, sf_dir)
    return matrix_profile_blobs(toks, W, max_tokens=None).select(
        "doc_id", "w", "n_tok", "n_used", "truncated", "profile_len",
        F.col("mp_blob").isNotNull().alias("has_mp"),
        F.col("pi_blob").isNotNull().alias("has_pi"),
        "algo",
    )


SQL_MP_BLOBS = f"""
WITH n AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT doc_id, {W} AS w, CAST(n_tok AS INT) AS n_tok,
       CAST(n_tok AS INT) AS n_used, FALSE AS truncated,
       CAST(CASE WHEN n_tok >= 2 * {W} THEN n_tok - {W} + 1 ELSE 0 END AS INT)
         AS profile_len,
       n_tok >= 2 * {W} AS has_mp, n_tok >= 2 * {W} AS has_pi,
       'mpx' AS algo
FROM n
"""




def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-1 (probe 4 of 8 k-means lists) — rows-only
    (approximate by design; recall vs brute force is unit-tested, and
    nprobe == n_lists is tested equal to the exact result)."""
    from .operators.similarity import ivf_topk

    return ivf_topk(_emb(spark, sf_dir), n_lists=8, nprobe=4, k=1, num_queries=20)




def q_lang_id_trigram(spark, sf_dir):
    from .functions.text import lang_id_trigram

    return lang_id_trigram(_docs(spark, sf_dir))


SQL_LANG_ID_TRIGRAM = """
WITH grams AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
         UNNEST([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS tri
  FROM documents
),
prof AS (
  SELECT lang AS profile_lang, tri,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tri ASC) AS rn
  FROM grams GROUP BY lang, tri
),
profile AS (SELECT profile_lang, tri FROM prof WHERE rn <= 50),
hits AS (
  SELECT g.doc_id, p.profile_lang, CAST(COUNT(*) AS BIGINT) AS hits
  FROM grams g JOIN profile p ON g.tri = p.tri
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, profile_lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, profile_lang ASC) AS rn
  FROM hits
)
SELECT doc_id, profile_lang AS lang_pred, hits FROM best WHERE rn = 1
"""




def q_rollup_by_source(spark, sf_dir):
    """Corpus-level rollup: exact per-(source, bucket) stats across docs —
    the fleet-wide view of the same tier cascade (one extra exact-int
    groupBy over the finest tier)."""
    m1 = finest_rollup(_tok(spark, sf_dir), BUCKET)
    return (
        m1.groupBy("source", "bucket")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sumsq").alias("sumsq"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


SQL_ROLLUP_BY_SOURCE = f"""
WITH {TOK_CTE}
SELECT source, CAST((pos - 1) // {BUCKET} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(tok) AS BIGINT) AS sum_v,
       CAST(SUM(tok * tok) AS BIGINT) AS sumsq,
       CAST(MIN(tok) AS INT) AS min_v,
       CAST(MAX(tok) AS INT) AS max_v,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM pos GROUP BY 1, 2
"""


def q_motifs_discords(spark, sf_dir):
    """Top-level motif/discord extraction: per doc, the window with the
    SMALLEST matrix-profile value (motif: best-repeated pattern) and the
    LARGEST (discord: most anomalous), deterministic tie-breaks."""
    from pyspark.sql.window import Window

    mp = matrix_profile_exact(_tok(spark, sf_dir), W, ez=0.5)
    w_min = Window.partitionBy("doc_id").orderBy(F.col("mp").asc(), F.col("off").asc())
    w_max = Window.partitionBy("doc_id").orderBy(F.col("mp").desc(), F.col("off").asc())
    motifs = (
        mp.withColumn("rn", F.row_number().over(w_min)).filter(F.col("rn") == 1)
        .select("doc_id", F.col("off").alias("motif_off"),
                F.col("nn_off").alias("motif_nn"), F.col("mp").alias("motif_mp"))
    )
    discords = (
        mp.withColumn("rn", F.row_number().over(w_max)).filter(F.col("rn") == 1)
        .select("doc_id", F.col("off").alias("discord_off"), F.col("mp").alias("discord_mp"))
    )
    return motifs.join(discords, "doc_id")


SQL_MOTIFS_DISCORDS = (
    SQL_MATRIX_PROFILE_W8.rstrip().replace(
        """SELECT doc_id, CAST(off AS INT) AS off, sqrt(d) AS mp, CAST(nn AS INT) AS nn_off
FROM best WHERE rn = 1""",
        """,
mp AS (
  SELECT doc_id, CAST(off AS INT) AS off, sqrt(d) AS mp, CAST(nn AS INT) AS nn_off
  FROM best WHERE rn = 1
),
mo AS (
  SELECT doc_id, off AS motif_off, nn_off AS motif_nn, mp AS motif_mp,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY mp ASC, off ASC) AS rn
  FROM mp
),
di AS (
  SELECT doc_id, off AS discord_off, mp AS discord_mp,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY mp DESC, off ASC) AS rn
  FROM mp
)
SELECT m.doc_id, m.motif_off, m.motif_nn, m.motif_mp, d.discord_off, d.discord_mp
FROM mo m JOIN di d ON m.doc_id = d.doc_id AND m.rn = 1 AND d.rn = 1""",
    )
)


# ---------------------------------------------------------------- registry

def queries() -> dict:
    q = {
        "rollup_1m": q_rollup_1m,
        "rollup_cascade": q_rollup_cascade,
        "gapfill": q_gapfill,
        "sliding_stats_w8": q_sliding_stats,
        "zero_crossings_w16": q_zero_crossings,
        "complexity": q_complexity,
        "doc_znorm_stats": q_doc_znorm_stats,
        "mode_token": q_mode_token,
        "mass_w8": q_mass_w8,
        "matrix_profile_w8": q_matrix_profile_w8,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "ann_topk": q_ann_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "text_stats": q_text_stats,
        "lang_guess": q_lang_guess,
        "token_counts": q_token_counts,
        "fingerprint": q_fingerprint,
        # rows-only: the real MP kernels on the synthetic tokens table
        "kernel_stomp_w64": _kernel_query("stomp", 64),
        "kernel_stamp_w64": _kernel_query("stamp", 64),
        "kernel_scrimp_w64": _kernel_query("scrimp", 64),
        "kernel_mpx_w64": _kernel_query("mpx", 64),
        "kernel_mass_w64": _kernel_query("mass", 64),
        "kernel_mpxab_w64": _mpxab_query,
        "kernel_contrast_w50": _contrast_query,
        "kernel_mov_weighted_fading": _mov_variants_query,
        "binary_split": q_binary_split,
        "normalize_params": q_normalize_params,
        "ed_corr_roundtrip": q_ed_corr,
        "events_rollup_1h": q_events_rollup,
        "tier_blobs": q_tier_blobs,
        "image_features": q_image_features,
        "audio_features": q_audio_features,
        "ann_srp_buckets": q_srp_buckets,
        "tpch_q1_cents": q_tpch_q1,
        "tpch_top_customers": q_tpch_top_customers,
        "matrix_profile_blobs": q_mp_blobs,
        "ann_ivf_topk": q_ann_ivf_topk,
        "lang_id_trigram": q_lang_id_trigram,
        "rollup_by_source": q_rollup_by_source,
        "motifs_discords": q_motifs_discords,
    }
    return q


def oracle_sql() -> dict:
    return {
        "rollup_1m": SQL_ROLLUP_1M,
        "rollup_cascade": SQL_ROLLUP_CASCADE,
        "gapfill": SQL_GAPFILL,
        "sliding_stats_w8": SQL_SLIDING_STATS,
        "zero_crossings_w16": SQL_ZERO_CROSSINGS,
        "complexity": SQL_COMPLEXITY,
        "doc_znorm_stats": SQL_DOC_ZNORM_STATS,
        "mode_token": SQL_MODE_TOKEN,
        "mass_w8": SQL_MASS_W8,
        "matrix_profile_w8": SQL_MATRIX_PROFILE_W8,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
        "ann_topk": SQL_ANN_TOPK,
        "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
        "text_stats": SQL_TEXT_STATS,
        "lang_guess": SQL_LANG_GUESS,
        "token_counts": SQL_TOKEN_COUNTS,
        "fingerprint": SQL_FINGERPRINT,
        "normalize_params": SQL_NORMALIZE_PARAMS,
        "ed_corr_roundtrip": SQL_ED_CORR,
        "events_rollup_1h": SQL_EVENTS_ROLLUP,
        "tpch_q1_cents": SQL_TPCH_Q1,
        "tpch_top_customers": SQL_TPCH_TOP_CUSTOMERS,
        "lang_id_trigram": SQL_LANG_ID_TRIGRAM,
        "rollup_by_source": SQL_ROLLUP_BY_SOURCE,
        "motifs_discords": SQL_MOTIFS_DISCORDS,
    }
