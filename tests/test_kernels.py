"""Kernel unit tests: URL canonicalization vs the Python mirror, hash
parity, deterministic dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from nde_crawlers_spark.functions import urls as U
from nde_crawlers_spark.operators import frontier as FR
from nde_crawlers_spark.plans.oracle import canonical_url_py, hash_seq_py, url_hash_py

CASES = [
    "HTTPS://Host-A.Example.org:443/Doc/12/?b=2&a=1#frag",
    "http://host-b.example.org:80/x//",
    "https://host-b.example.org/x",
    "https://h.org",
    "ftp://H.ORG:21/a?x=1&x=0#f",
    "https://h.org:8443/p/q/?z=1",
    "https://h.org/a?single",
    "https://h.org/trail///",
]


def test_canonicalization_matches_python_mirror(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    rows = (
        U.with_url_columns(df)
        .withColumn("seq", U.hash_seq(F.col("canonical_url")))
        .select("url", "canonical_url", "url_hash", "seq")
        .collect()
    )
    for r in rows:
        expect = canonical_url_py(r["url"])
        assert r["canonical_url"] == expect, r["url"]
        assert r["url_hash"] == url_hash_py(expect)
        assert r["seq"] == hash_seq_py(expect)


def test_dedupe_candidates_is_partitioning_independent(spark):
    data = [
        ("https://h.org/a?b=1&a=2", 3),
        ("https://H.ORG/a?a=2&b=1", 1),   # same canonical, better priority
        ("https://h.org:443/a?a=2&b=1", 5),
        ("https://h.org/b", 2),
    ]
    df = U.with_url_columns(
        spark.createDataFrame(data, ["url", "priority"])
    ).withColumn("seq", U.hash_seq(F.col("canonical_url")))
    for parts in (1, 7):
        out = FR.dedupe_candidates(df.repartition(parts)).collect()
        got = {r["url_hash"]: (r["priority"], r["url"]) for r in out}
        assert len(got) == 2
        dup_hash = url_hash_py(canonical_url_py(data[0][0]))
        assert got[dup_hash][0] == 1
        assert got[dup_hash][1] == "https://H.ORG/a?a=2&b=1"


def test_topk_per_host_two_phase_equals_exact(spark):
    import itertools

    rows = [
        (f"h{i % 3}", i % 4, i * 7 % 101, f"{i:064d}", 3) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["host", "priority", "seq", "url_hash", "host_budget"])
    got = FR.topk_per_host(df, salt_factor=4).select("host", "url_hash").collect()
    got_set = {(r["host"], r["url_hash"]) for r in got}
    expect = set()
    for host, grp in itertools.groupby(sorted(rows), key=lambda r: r[0]):
        for r in sorted(grp, key=lambda r: (r[1], r[2], r[3]))[:3]:
            expect.add((host, r[3]))
    assert got_set == expect


def test_hyperplane_buckets_balanced_on_correlated_vectors(spark):
    """The round-1 audit's scale finding: axis-aligned sign buckets
    collapse on correlated embeddings (all-positive leading dims -> one
    hot bucket -> quadratic join). Random hyperplanes must keep spreading
    them."""
    import pyspark.sql.functions as F

    from nde_crawlers_spark.functions.vectors import hyperplane_bucket, sign_bucket

    # anisotropic corpus: the leading 8 dims are a constant positive bias
    # (every vector shares them -> sign_bucket sees one bucket), while the
    # tail dims carry the actual angular diversity
    dim = 64
    rows = []
    for i in range(256):
        v = [2.0] * 8 + [(((i * 2654435761 + d * 40503) % 1024) - 512) / 512.0
                         for d in range(8, dim)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    signs = emb.select(sign_bucket(F.col("embedding"), 8).alias("b")).distinct().count()
    hyper = emb.select(hyperplane_bucket(F.col("embedding"), 8, dim).alias("b")).distinct().count()
    assert signs == 1            # the collapse the audit predicted
    assert hyper >= 10           # hyperplanes keep splitting the cone

    # and the hot-bucket population bound that actually matters for the
    # self-join: no bucket should hold more than ~1/4 of the corpus
    top = (
        emb.select(hyperplane_bucket(F.col("embedding"), 8, dim).alias("b"))
        .groupBy("b").count().agg(F.max("count")).first()[0]
    )
    assert top <= 96  # vs 256-in-one-bucket for the axis-aligned form
