"""Cap-ACTIVE regime tests (VERDICT r4 #1): the scale-hygiene caps —
n-gram ``max_doc_freq``, LSH ``_cap_buckets``, decontamination DF cap —
must be shown to FIRE (drop > 0 keys / change the candidate set), not just
to exist in the plan. The driver faces embed the dropped-key census in
their hashed output; these tests pin the same facts locally and add a
constructed hot-bucket fixture where the cap's effect is fully derivable
by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect())


def test_ngram_df_cap_fires_and_changes_output(spark):
    """At cap=2 the corpus has grams in >2 docs: the census is positive,
    and the capped pair set differs from the uncapped one at the same
    threshold (dropped grams change common/na/nb and pair membership)."""
    from matrixprofiler_spark.queries import (
        CAPFIRE_DF,
        CAPFIRE_NGRAM_THR,
        q_dedup_ngram_capfire,
    )
    from matrixprofiler_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = q_dedup_ngram_capfire(spark, SF).collect()
    assert out and all(r.n_capped_grams > 0 for r in out)
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=CAPFIRE_NGRAM_THR,
                                   max_doc_freq=None)
    capped_set = sorted((r.doc_a, r.doc_b) for r in out)
    assert capped_set != _pairs(uncapped)
    assert CAPFIRE_DF == 2  # census column counts keys with DF > this


def test_lsh_bucket_cap_fires_and_prunes_pairs(spark):
    """At max_bucket=2 the corpus has 3-doc LSH buckets: the census is
    positive and the capped candidate set is a strict subset of the
    uncapped one (a dropped bucket can only remove pairs)."""
    from matrixprofiler_spark.queries import q_dedup_lsh_capfire
    from matrixprofiler_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = q_dedup_lsh_capfire(spark, SF).collect()
    assert out and all(r.n_capped_buckets > 0 for r in out)
    capped = set((r.doc_a, r.doc_b) for r in out)
    uncapped = set(_pairs(minhash_lsh_pairs(docs, max_bucket=None)))
    assert capped < uncapped  # strict subset: the cap removed candidates


def test_decontamination_cap_fires(spark):
    """At cap=2 the corpus has 5-grams in >2 docs; the census rides on
    every output row and is positive."""
    from matrixprofiler_spark.queries import q_decontamination_capfire

    out = q_decontamination_capfire(spark, SF).collect()
    assert out and all(r.n_capped_grams > 0 for r in out)


def test_cap_buckets_constructed_hot_bucket(spark):
    """Hand-derivable fixture: 5 identical docs + 2 identical docs. Every
    band bucket of the 5-clone group has exactly 5 members, the 2-clone
    group 2. max_bucket=4 must drop ALL 4 buckets of the 5-group (its 10
    pairs vanish) while the 2-group's pair survives — the reference analog
    is the ez-band masking tests (src/stomp.cpp:126-131), which certify a
    mask by constructing input where it bites."""
    from matrixprofiler_spark.operators.dedup import minhash_lsh_pairs

    text_a = " ".join(f"tok{i % 7}word{i}" for i in range(30))
    text_b = " ".join(f"other{i}gram{i % 5}" for i in range(30))
    rows = [(i, "s", text_a) for i in range(5)] + [(10 + i, "s", text_b) for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    uncapped = _pairs(minhash_lsh_pairs(docs, max_bucket=None))
    assert len(uncapped) == 10 + 1  # C(5,2) clone pairs + the one 2-clone pair
    capped = _pairs(minhash_lsh_pairs(docs, max_bucket=4))
    assert capped == [("10", "11")]  # hot bucket gone, small bucket kept


def test_ngram_df_cap_constructed_hot_gram(spark):
    """Fixture where one shared phrase spans many docs: docs 0-4 share a
    3-gram-rich boilerplate sentence plus unique tails; with the cap below
    5 the boilerplate grams leave the universe and no pair reaches the
    threshold; uncapped, every clone pair does."""
    from matrixprofiler_spark.operators.dedup import ngram_jaccard_pairs

    boiler = " ".join(f"legal{i}footer{i}" for i in range(20))
    rows = [(i, "s", boiler + " " + " ".join(f"tail{i}x{j}" for j in range(4)))
            for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_doc_freq=None)
    assert uncapped.count() == 10  # all C(5,2) boilerplate pairs
    capped = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_doc_freq=4)
    assert capped.count() == 0  # boilerplate grams dropped -> no candidates
