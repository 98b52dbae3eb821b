"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl-scheduling query on sf0.001;
``queries()``/``oracle_sql()`` expose the full catalog from
``nde_crawlers_spark`` (67 oracle-checked catalog queries, plus the
oracle-checked e2e signature row and 3 non-SQL-expressible extras
checked rows-only). The driver oracle-checks the first 50 catalog
entries; the rotation rule (at ``_WINDOW_PRIORITY`` below) guarantees the
union of two consecutive rounds' driver windows covers the complete
catalog, and every query stays covered by the full-catalog parity mirror
(tests/test_queries_parity.py) every run.
"""

from __future__ import annotations

import functools
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nde_crawlers_spark.oracles import ORACLES
from nde_crawlers_spark.queries import QUERIES, crawl_frontier_topk


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the politeness-scheduled fetch list — canonicalize a
    derived frontier, apply robots rules, take the per-host budgeted
    top-k in deterministic total order (SURVEY §2.6's core operator)."""
    return crawl_frontier_topk(spark, "/root/testdata/sf0.001")


# ---- non-SQL-expressible extras (driver records rows-only checks) ----

def _crawl_e2e_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two checkpointed crawl rounds on a 100-seed synthetic frontier;
    returns the harvested documents (spans flattened for a stable
    schema). Oracle-equivalence of order/seen/spans is asserted in
    tests/test_crawl_oracle.py against the straight-line Python oracle
    AND witnessed by the driver gate via crawl_e2e_signatures."""
    docs = _e2e_crawl_run(spark, "nde_spark_e2e").documents()
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id", "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def _e2e_crawl_run(spark: SparkSession, run_name: str):
    """The shared e2e crawl scenario (100 seeds / 10 hosts / 2 rounds)
    under a caller-chosen run dir."""
    from nde_crawlers_spark.plans.crawl import CrawlConfig, CrawlRun
    from nde_crawlers_spark.sources.synthetic import make_seeds

    seeds = make_seeds(100, 10)
    run = CrawlRun(
        spark,
        os.path.join(tempfile.gettempdir(), run_name),
        CrawlConfig(num_hosts=10, round_seconds=2, max_rounds=2),
    )
    sdf = spark.createDataFrame([(s["url"], s["priority"]) for s in seeds], ["url", "priority"])
    run.run(seeds=sdf)
    return run


def _span_doc_string(doc_id, spans):
    """Column expr: one canonical string per harvested document —
    doc_id '=' ';'-joined 'kind,text,media_ref,offset' spans. Mirrored
    literally by _py_oracle_signatures; any formatting drift breaks the
    driver hash on purpose."""
    return F.concat(
        doc_id, F.lit("="),
        F.array_join(
            F.transform(
                spans,
                lambda s: F.concat_ws(
                    ",", s.getField("kind"), s.getField("text"),
                    s.getField("media_ref"), s.getField("offset"),
                ),
            ),
            ";",
        ),
    )


def _crawl_e2e_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule invariants as a DRIVER-CHECKABLE one-row query:
    md5 signatures of (a) the crawl ORDER (round:priority:seq:url_hash
    in total order), (b) the URL-SEEN set, (c) every harvested
    document's span sequence — computed from the Spark crawl with
    DataFrame aggregates. The oracle SQL (oracle_sql()) carries the
    LITERAL signatures produced by the independent straight-line Python
    oracle (plans/oracle.py) over the same scenario, so the driver gate
    itself witnesses order/seen/span equality end-to-end."""
    run = _e2e_crawl_run(spark, "nde_spark_sig")
    order_sig = run.crawl_order().agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("round", "priority", "seq", "url_hash"))
                    ),
                    lambda s: F.concat_ws(
                        ":", s.getField("round"), s.getField("priority"),
                        s.getField("seq"), s.getField("url_hash"),
                    ),
                ),
                "|",
            )
        ).alias("order_sig"),
        F.count("*").cast("int").alias("n_order"),
    )
    seen_sig = run.seen().agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("url_hash")), "|")).alias("seen_sig"),
        F.count("*").cast("int").alias("n_seen"),
    )
    docs_sig = run.documents().select(
        _span_doc_string(F.col("doc_id"), F.col("spans")).alias("d")
    ).agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("d")), "|")).alias("docs_sig"),
        F.count("*").cast("int").alias("n_docs"),
    )
    return order_sig.crossJoin(seen_sig).crossJoin(docs_sig)


@functools.lru_cache(maxsize=1)
def _py_oracle_signatures() -> dict:
    """The Python oracle's literal signatures for the shared e2e
    scenario — the oracle side of crawl_e2e_signatures."""
    import hashlib

    from nde_crawlers_spark.plans.oracle import crawl_oracle
    from nde_crawlers_spark.sources.synthetic import make_seeds

    orc = crawl_oracle(make_seeds(100, 10), 10, round_seconds=2, max_rounds=2)
    md5 = lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()  # noqa: E731
    order_strs = [f"{r}:{p}:{q}:{h}" for r, p, q, h in sorted(orc.order)]
    doc_strs = sorted(
        k + "=" + ";".join(f"{kd},{tx},{mr},{off}" for kd, tx, mr, off in v)
        for k, v in orc.documents.items()
    )
    return {
        "order_sig": md5("|".join(order_strs)), "n_order": len(order_strs),
        "seen_sig": md5("|".join(sorted(orc.seen))), "n_seen": len(orc.seen),
        "docs_sig": md5("|".join(doc_strs)), "n_docs": len(doc_strs),
    }


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media plumbing: spans -> binary payload table -> Arrow-batched
    feature extraction (deterministic stub decode)."""
    from nde_crawlers_spark.operators.multimodal import decode_media, media_table_from_spans
    from nde_crawlers_spark.plans.crawl import CrawlConfig, CrawlRun
    from nde_crawlers_spark.sources.synthetic import make_seeds

    run = CrawlRun(
        spark,
        os.path.join(tempfile.gettempdir(), "nde_spark_mm"),
        CrawlConfig(num_hosts=10, round_seconds=2, max_rounds=1),
    )
    seeds = make_seeds(80, 10)
    sdf = spark.createDataFrame([(s["url"], s["priority"]) for s in seeds], ["url", "priority"])
    run.run(seeds=sdf)
    media = media_table_from_spans(run.documents())
    return decode_media(media, fake=True).select(
        "media_ref", "media_kind", F.col("width"), F.col("height"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
    )


def _uploader_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's uploader stage chain (SURVEY §2.11:
    standardize -> enrich -> wrapper) composed end-to-end over CRAWLED
    documents, on the WIDE nested NDE record (operators/nde_schema.py):
    crawl -> spans -> NDE record -> uploader-REGISTRY dispatch (per-host
    source families: placeholder scrub + casefold) -> schema gate ->
    add_date -> completeness score -> dedup keep-one. Rows-only check;
    each stage is oracle-checked individually elsewhere
    (nde_record_normalize for the record pass, uploader_registry /
    nde_pipeline_e2e for the registry + merge composition)."""
    from nde_crawlers_spark.operators import wrapper as W
    from nde_crawlers_spark.operators.dedup import drop_exact_duplicates
    from nde_crawlers_spark.operators.nde_schema import schema_violation_nde, spans_to_nde
    from nde_crawlers_spark.plans.crawl import CrawlConfig, CrawlRun
    from nde_crawlers_spark.sources.synthetic import make_seeds
    from nde_crawlers_spark.uploaders import run_uploader

    run = CrawlRun(
        spark,
        os.path.join(tempfile.gettempdir(), "nde_spark_upl"),
        CrawlConfig(num_hosts=10, round_seconds=2, max_rounds=1),
    )
    seeds = make_seeds(80, 10)
    run.run(seeds=spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], ["url", "priority"]))
    rec = spans_to_nde(run.documents())
    # source = the crawled host, mapped onto REAL uploader specs (the
    # reference maps one uploader per source repository): each host-i
    # dispatches the chain of the i-th real fixture source — every
    # host gets the wrapper tail (placeholder scrub + casefold; all 59
    # reference uploaders are wrapped), zenodo-mapped hosts promote
    # DOIs; operator
    # stages skip (their lookups/columns are absent in this rows-only
    # path) exactly as the registry contract specifies
    from nde_crawlers_spark.uploaders import FIXTURE_SOURCES, UPLOADERS

    host = F.regexp_extract("canonical_url", r"://([^/]+)/", 1)
    rec = rec.withColumn("source", F.regexp_replace(host, r"\..*$", ""))
    registry = {
        f"host-{i:04d}": UPLOADERS[FIXTURE_SOURCES[i % len(FIXTURE_SOURCES)]]
        for i in range(10)
    }
    rec = run_uploader(rec, registry)
    gated = rec.withColumn(
        "violation",
        schema_violation_nde(
            F.col("type"), F.col("url"), F.lit(None).cast("string"),
            F.col("includedInDataCatalog"), F.col("creativeWorkStatus"),
        ),
    ).filter(F.col("violation").isNull())
    scored = gated.select(
        F.col("_id"),
        F.col("name"),
        F.try_element_at(F.col("author"), F.lit(1)).getField("name").alias("author"),
        W.add_date(F.col("datePublished")).alias("date"),
        F.size("keywords").alias("n_keywords"),
        F.size("distribution").alias("n_media"),
        W.completeness_score(
            required=[F.col("name"), F.col("datePublished")],
            recommended=[F.col("description"), F.try_element_at(F.col("author"), F.lit(1)).getField("name")],
        ).alias("score"),
        F.col("description").alias("text"),
    )
    return drop_exact_duplicates(scored, id_col="_id").drop("text")


# ROTATION RULE (instituted r5, per the r4 verdict): the driver
# oracle-checks only the FIRST 50 entries of queries(), so the window
# ROTATES round-robin — every query that earned a green driver row in
# the PREVIOUS round's window is eligible to rotate behind the window
# this round, and everything that sat behind it rotates back in. The
# union of any two consecutive CORRECTNESS_r{N} files therefore covers
# the COMPLETE catalog; the full-catalog DuckDB parity mirror
# (tests/test_queries_parity.py) still checks every query every run.
# Queries whose implementation or oracle changed in the current round
# are PINNED in-window regardless of rotation (head of the list).
_WINDOW_PRIORITY = [
    # r6 pinned: implementation or oracle changed this round —
    # disamb stage (uploader_registry/nde_pipeline_e2e), Scrapy
    # max(target, mean) fold + 5s START_DELAY (crawl_autothrottle_budget
    # + the e2e rows), guarded cuckoo delete (crawl_recrawl_ttl), and
    # the new embed memo row
    "uploader_registry",
    "nde_pipeline_e2e",
    "crawl_autothrottle_budget",
    "crawl_recrawl_ttl",
    "embed_memo_cache",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
]
# settled r5-green rows rotating behind the window for r6 (every name
# below has a green hash-match row in CORRECTNESS_r05.json and stays
# covered by the full-catalog parity mirror); the 21 r4-settled queries
# rotated out last round return to the window per the rule
_ROTATED_OUT = [
    "dedup_minhash_lsh",
    "dedup_simhash64_hamming",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_cluster_components",
    "dedup_semantic_keepone",
    "dedup_incremental_minhash",
    "dedup_exact_substring",
    "text_decontaminate",
    "text_importance_weights",
    "text_analyze",
    "text_lang_agreement",
    "text_quality_filter",
    "text_bpe_tokens",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "merge_priority_lastwriter",
    "merge_apply_1x1",
    "enrich_broadcast_lookup",
    "enrich_explode_collect",
    "enrich_lineage_expand",
    "enrich_reclassify",
    "enrich_drop_rules",
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q5ish",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        k: QUERIES[k] for k in _WINDOW_PRIORITY
    }
    # north-rule order/seen/span signatures, oracle-checked against the
    # Python oracle's literal signatures (driver-visible e2e evidence)
    out["crawl_e2e_signatures"] = _crawl_e2e_signatures
    # rows-only extras rotate IN this round (rotation rule above):
    # flagship e2e crawl + media plumbing + wide-record uploader chain
    out["crawl_e2e_documents"] = _crawl_e2e_documents
    out["multimodal_features"] = _multimodal_features
    out["uploader_pipeline"] = _uploader_pipeline
    for k, v in QUERIES.items():
        if k not in out and k not in _ROTATED_OUT:
            out[k] = v
    for k in _ROTATED_OUT:
        out[k] = QUERIES[k]
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    # e2e crawl signatures: the oracle side is the LITERAL signature set
    # from the independent Python oracle (computed once per process)
    sig = _py_oracle_signatures()
    out["crawl_e2e_signatures"] = (
        f"SELECT '{sig['order_sig']}' AS order_sig, {sig['n_order']} AS n_order, "
        f"'{sig['seen_sig']}' AS seen_sig, {sig['n_seen']} AS n_seen, "
        f"'{sig['docs_sig']}' AS docs_sig, {sig['n_docs']} AS n_docs"
    )
    return out
