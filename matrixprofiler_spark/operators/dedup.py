"""Deduplication operators over the documents table.

All built from JVM-side DataFrame expressions (no Python UDFs), so they run
whole-stage-codegen'd and scale: the shuffles are the unavoidable
groupBy/join on the dedup keys, and every join key is a bounded-cardinality
blocking key (hash, ngram, band) — never a cross join.

* exact:      md5(text) groupBy — one shuffle on the digest.
* ngram-jaccard: word n-gram set join within a blocking key; pair counts /
  (|A| + |B| - common) — classic candidate-pair generation, skew-bounded by
  blocking on source.
* minhash-LSH: per-doc signature = min(md5(gram || seed)) per seed (the
  min-wise-independent trick with a keyed digest); bands of adjacent
  signature slots; docs sharing a band bucket are candidate pairs.
* simhash:    64-bit sign-aggregated fingerprint from word digests
  (xxhash64), hamming-close pairs are near-dups.
* embedding cosine: see operators/similarity.py (quantized-exact cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_words(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        F.split(F.col("text"), " ").alias("words"),
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(F.col("doc_id").cast("long")).alias("keep_doc_id"),
        )
    )


def _ngrams(words_col, n: int):
    """Distinct word n-grams of a words array (JVM-side)."""
    return F.array_distinct(
        F.filter(
            F.transform(
                words_col,
                lambda w, i: F.when(
                    i <= F.size(words_col) - n,
                    F.concat_ws(" ", *[F.element_at(words_col, i + k + 1) for k in range(n)]),
                ),
            ),
            lambda g: g.isNotNull(),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Candidate near-dup pairs by word n-gram Jaccard >= threshold.

    Plan: explode distinct n-grams -> self equi-join on (source, gram) ->
    pair-count aggregation -> Jaccard from exact int counts. Blocking on
    ``source`` bounds the join fan-out.

    ``max_doc_freq`` is the candidate-pair skew hygiene for web scale: a
    gram appearing in more than K docs ("of the and") fans the self-join
    out quadratically on one hot key, so such grams are dropped from the
    gram universe (both the join AND the set sizes — Jaccard over the
    capped space). The join fan-out is then bounded by K^2 per gram."""
    w = doc_words(docs)
    grams = w.select(
        "doc_id", "source", F.explode(_ngrams(F.col("words"), n)).alias("gram")
    )
    # materialize the gram universe ONCE per invocation (lazy local
    # checkpoint, computed by the first action): the rarity filter, both
    # self-join sides and both size lookups otherwise re-run the explode
    # + n-gram string assembly up to 8x inside one physical plan (plan-
    # counted; guide §3.3 "materialising an intermediate truncates the
    # plan"). Below the cap machinery, so the DF-cap aggregates stay
    # visible in the plan (plan-linted). Same executor-local persistence
    # class the star-contraction rounds already rely on.
    grams = grams.localCheckpoint(eager=False)
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("source", "gram")
            .count()
            .filter(F.col("count") <= max_doc_freq)
            .select("source", "gram")
        )
        grams = grams.join(rare, ["source", "gram"])
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    pairs = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.source") == F.col("b.source")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    # NOTE: no broadcast hint — sizes has one row per doc (billions at
    # corpus scale); the candidate-pair side is the small one after
    # blocking, so let AQE pick the join strategy per actual sizes
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
    )
    return out


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 8) -> DataFrame:
    """Min-hash signature per doc: slot k = min over n-grams of
    md5(gram || '#' || k) (keyed digest as the hash family). Digest-hex min
    is a lexicographic string min — identical in any engine."""
    w = doc_words(docs)
    grams = w.select("doc_id", F.explode(_ngrams(F.col("words"), n)).alias("gram"))
    aggs = [
        F.min(F.md5(F.concat(F.col("gram"), F.lit(f"#{k}")))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return grams.groupBy("doc_id").agg(*aggs)


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket: int | None) -> DataFrame:
    """LSH bucket-size hygiene: DROP buckets with more than ``max_bucket``
    members before the self-join. A degenerate bucket (boilerplate /
    near-empty docs sharing a signature) is an uncapped quadratic hot key
    at corpus scale; a bucket past the cap carries ~no near-dup signal, so
    dropping it is the standard recall/cost trade (same pattern as the
    n-gram ``max_doc_freq`` cap). One extra map-side-combinable count
    aggregation; fan-out is then bounded by max_bucket^2 per bucket."""
    if max_bucket is None:
        return df
    ok = (
        df.groupBy(*keys)
        .count()
        .filter(F.col("count") <= max_bucket)
        .select(*keys)
    )
    return df.join(ok, keys)


def minhash_bands(docs: DataFrame, n: int = 3, num_hashes: int = 8,
                  band_size: int = 2) -> DataFrame:
    """(doc_id, band, bucket) LSH band assignments (pre-cap): band id =
    concat of ``band_size`` adjacent signature slots. Exposed separately
    so cap-accounting faces can census oversize buckets against the same
    band universe the pairs join consumes."""
    sig = minhash_signatures(docs, n, num_hashes)
    # one row per doc and consumed by every band branch of the union plus
    # the bucket cap and both join sides — without the checkpoint the
    # whole gram explode + 8-slot min aggregate re-runs per reference
    # (up to 10x in one plan); lazy, so no job until the caller acts
    sig = sig.localCheckpoint(eager=False)
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    return all_bands


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 8,
                      band_size: int = 2,
                      max_bucket: int | None = 256) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket pair up. Buckets
    with more than ``max_bucket`` members are dropped (see _cap_buckets)."""
    all_bands = _cap_buckets(
        minhash_bands(docs, n, num_hashes, band_size), ["band", "bucket"], max_bucket
    )
    a = all_bands.alias("a")
    b2 = all_bands.alias("b")
    return (
        a.join(b2, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash64(docs: DataFrame, hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per doc from word digests: bit j of the fingerprint =
    sign of sum over words of (+1 if digest bit j else -1).

    Pure DataFrame: explode words -> per-bit contribution via bitwise ops ->
    groupBy doc. Runs JVM-side; 64 shifted-AND expressions.

    hash_fn: "xxhash64" (fast JVM hash — production default) or "md5"
    (bit j taken from the md5 hex digits — portable across engines, the
    ANSI-SQL-oracle face)."""
    w = doc_words(docs).select("doc_id", F.explode("words").alias("word"))
    if hash_fn == "xxhash64":
        h = w.select("doc_id", F.xxhash64("word").alias("h"))
        bit = [F.expr(f"(h >> {j}) & 1") for j in range(64)]
    elif hash_fn == "md5":
        hexd = F.md5(F.col("word"))
        digits = [
            F.conv(F.substring(hexd, kk + 1, 1), 16, 10).cast("int")
            for kk in range(16)
        ]
        h = w.select("doc_id", *[d.alias(f"d{kk}") for kk, d in enumerate(digits)])
        bit = [
            F.shiftright(F.col(f"d{j // 4}"), j % 4).bitwiseAND(F.lit(1))
            for j in range(64)
        ]
    else:
        raise ValueError(hash_fn)
    bit_sums = [
        F.sum(F.when(bit[j] == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"b{j}")
        for j in range(64)
    ]
    agg = h.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(64):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        shifted = F.shiftleft(term, j)
        fp = shifted if fp is None else fp.bitwiseOR(shifted)
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  hash_fn: str = "xxhash64", n_blocks: int = 4,
                  max_bucket: int | None = 256) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: the 64-bit fingerprint is cut into ``n_blocks`` disjoint
    16-bit slices; docs sharing ANY slice value are candidates (multi-
    block LSH — recall rises with n_blocks, and each join key stays a
    bounded-cardinality 16-bit bucket; shift+mask is engine-portable,
    arithmetic sign-extension masked away). Slices shared by more than
    ``max_bucket`` docs are dropped (see _cap_buckets)."""
    s = simhash64(docs, hash_fn=hash_fn)
    blocks = None
    for r in range(n_blocks):
        br = s.select(
            "doc_id", "simhash",
            F.lit(r).alias("slice_id"),
            F.shiftright("simhash", 16 * r).bitwiseAND(F.lit(65535)).alias("block"),
        )
        blocks = br if blocks is None else blocks.unionByName(br)
    blocks = _cap_buckets(blocks, ["slice_id", "block"], max_bucket)
    a = blocks.alias("a")
    b = blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["slice_id", "block"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "hamming")
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u links its LARGER neighbors to the
    minimum of N(u) + {u} (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — public algorithm)."""
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        bidir.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node u links its smaller-or-equal neighbors
    (and itself) to the minimum of those."""
    lo = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).filter(F.col("v") < F.col("u"))
    m = lo.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        lo.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return linked


def duplicate_components(docs: DataFrame, pairs: DataFrame,
                         max_iters: int = 20,
                         algorithm: str = "star") -> DataFrame:
    """Duplicate clusters from candidate pairs + one keeper per cluster
    (the smallest doc_id) — the final step of a dedup pipeline
    (keep-list). Returns (doc_id, component_id, is_keeper); singletons
    keep themselves.

    algorithm="star" (default): alternating large-star/small-star
    contraction — O(log n) rounds regardless of component diameter, the
    100-TB-safe shape (adversarial near-dup chains cannot blow the round
    count). algorithm="label": min-label propagation, rounds = graph
    diameter (kept for cross-checking; raises rather than returning
    mid-propagation labels when the diameter exceeds max_iters).
    Both check convergence with one scalar action per round."""
    if algorithm == "star":
        edges = (
            pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            # localCheckpoint truncates lineage each round — the iterated
            # plan otherwise grows superlinearly and stalls the analyzer
            .localCheckpoint(eager=True)
        )
        converged = False
        for _ in range(max_iters):
            e2 = _small_star(_large_star(edges)).localCheckpoint(eager=True)
            changed = (
                e2.exceptAll(edges).limit(1).count()
                + edges.exceptAll(e2).limit(1).count()
            )
            edges = e2
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"star contraction did not converge in {max_iters} rounds"
            )
        # converged edges form stars: node -> component root
        roots = edges.groupBy("u").agg(F.min("v").alias("comp"))
        verts = docs.select(F.col("doc_id").cast("string").alias("doc_id")).distinct()
        labels = verts.join(
            roots.select(F.col("u").alias("doc_id"), "comp"), "doc_id", "left"
        ).select(
            "doc_id", F.coalesce("comp", F.col("doc_id")).alias("comp")
        )
        return labels.select(
            "doc_id",
            F.col("comp").alias("component_id"),
            (F.col("doc_id") == F.col("comp")).alias("is_keeper"),
        )
    if algorithm != "label":
        raise ValueError(algorithm)
    verts = docs.select(F.col("doc_id").cast("string").alias("doc_id")).distinct()
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
        .unionByName(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("t")))
        .distinct()
        .persist()
    )
    labels = verts.select("doc_id", F.col("doc_id").alias("comp")).persist()
    changed = 0
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.t == labels.doc_id)
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.s, "left")
            .select(
                "doc_id",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # no silent caps: labels would be mid-propagation (wrong clusters)
        raise RuntimeError(
            f"duplicate_components did not converge within {max_iters} "
            f"iterations ({changed} labels still changing) — the pair graph "
            "has a longer chain than expected; raise max_iters or switch to "
            "star-contraction"
        )
    return labels.select(
        "doc_id",
        F.col("comp").alias("component_id"),
        (F.col("doc_id") == F.col("comp")).alias("is_keeper"),
    )
