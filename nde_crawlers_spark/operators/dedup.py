"""Deduplication operator family over the ``documents`` table.

The reference dedups only by ``_id`` (IgnoreDuplicatedStorage,
biothings-hub/files/nde-hub/hub/dataload/nde.py:120) and by DOI/identifier
group joins at merge time (hub/databuild/builder.py:34-329). A
training-data pipeline needs content-level dedup as well; this module adds
the standard ladder, each as a DataFrame composition with no Python UDFs:

- exact:        hash-groupBy on a content key
- minhash-lsh:  shingle -> MinHash signature -> banded bucket join
- simhash:      bit-vote fingerprint, bucket on equal fingerprints
- ngram-jaccard: candidate pairs from shared shingles -> exact Jaccard

Scale notes (100 TB): every variant reduces to groupBy/join on a derived
key — shuffle-heavy but embarrassingly key-parallel. The LSH band
explode multiplies rows by #bands (here 4): at 10^10 docs the band join
is salted by the band id itself (it is part of the key), so no single
reducer sees more than one bucket; AQE splits residual skew. The exact
Jaccard verification join only runs on candidate pairs, never the cross
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def content_key(text_col: str = "text", prefix_tokens: int | None = None) -> F.Column:
    """md5 content key; optionally over only the first N tokens (the
    'prefix dup' key used when corpora have boilerplate-identical heads)."""
    c = F.lower(F.col(text_col))
    if prefix_tokens is not None:
        toks = TX.tokens(F.col(text_col))
        c = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    return F.md5(c)


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                prefix_tokens: int | None = None) -> DataFrame:
    """Exact duplicate groups: (dup_key, group_size, keep_id, member_ids).

    keep_id = min id (deterministic first-write-wins, the analog of the
    reference's IgnoreDuplicatedStorage with a stable tiebreak)."""
    key = content_key(text_col, prefix_tokens)
    return (
        docs.select(F.col(id_col).alias("member_id"), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(
            F.count("*").alias("group_size"),
            F.min("member_id").alias("keep_id"),
            F.array_sort(F.collect_list("member_id")).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per content key (min id) — the dedup sink form."""
    w = Window.partitionBy(content_key(text_col)).orderBy(F.col(id_col))
    return docs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash+LSH candidate pairs: docs sharing any band bucket.

    signature length = bands*rows_per_band; collision threshold
    ~ (1/bands)^(1/rows_per_band). Returns (id_a, id_b, band) pairs with
    id_a < id_b, distinct."""
    k = bands * rows_per_band
    sig = TX.minhash_signature(TX.shingles(F.col(text_col), shingle_n), k)
    banded = (
        docs.select(F.col(id_col).alias("id"), sig.alias("sig"))
        .filter(F.element_at(F.col("sig"), 1).isNotNull())  # docs with >=1 shingle
        .select("id", F.posexplode(TX.lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("band", "bucket"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.band") == F.col("b.band"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash near-dup groups: docs with identical 16-bit simhash.
    (Production: 64-bit + multi-index Hamming<=3 blocking; identical plan
    shape — groupBy on derived key.)"""
    sh = TX.simhash16(TX.tokens(F.col(text_col)))
    return (
        docs.select(F.col(id_col).alias("member_id"), sh.alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.count("*").alias("group_size"),
            F.array_sort(F.collect_list("member_id")).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share >=1 shingle.

    Plan: explode shingles -> self-equi-join on shingle (candidate
    generation; never the cross product) -> distinct pairs -> join back
    both shingle sets -> exact Jaccard filter. At scale the candidate
    join is the cost center; raising shingle_n or pre-filtering rare
    shingles (drop shingles with df>limit, a stop-shingle list) bounds it.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(TX.shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).filter(F.size("sh") > 0)
    exploded = base.select("id", F.explode("sh").alias("s"))
    pairs = (
        exploded.alias("a")
        .join(exploded.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        pairs.join(base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(TX.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup: sign-LSH bucket -> in-bucket pairwise
    cosine >= threshold. Near-identical vectors share the sign bucket with
    overwhelming probability; the bucket join keeps the pair count
    ~N^2/2^bits instead of N^2."""
    from ..functions import vectors as V

    b = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        V.sign_bucket(F.col(vec_col), bucket_bits).alias("bucket"),
    )
    return (
        b.alias("a")
        .join(b.alias("b"), (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", F.round(V.cosine(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
