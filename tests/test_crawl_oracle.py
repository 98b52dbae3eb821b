"""End-to-end crawl vs the straight-line Python oracle: crawl ordering,
URL-seen set, span-sequence equality (BASELINE.json north-rule
invariants), kill-resume replay, and ordering determinism across
partitioning configurations."""

from __future__ import annotations

import tempfile

import pytest

from nde_crawlers_spark.plans.crawl import CrawlConfig, CrawlRun
from nde_crawlers_spark.plans.oracle import crawl_oracle
from nde_crawlers_spark.sources.synthetic import make_seeds

N_SEEDS, N_HOSTS, ROUNDS = 80, 10, 3


@pytest.fixture(scope="module")
def oracle():
    return crawl_oracle(make_seeds(N_SEEDS, N_HOSTS), N_HOSTS, round_seconds=2, max_rounds=ROUNDS)


def _seed_df(spark):
    return spark.createDataFrame(
        [(s["url"], s["priority"]) for s in make_seeds(N_SEEDS, N_HOSTS)], ["url", "priority"]
    )


def _invariants(run: CrawlRun):
    order = [
        (r["round"], r["priority"], r["seq"], r["url_hash"])
        for r in run.crawl_order().select("round", "priority", "seq", "url_hash").collect()
    ]
    seen = {r["url_hash"] for r in run.seen().collect()}
    docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in run.documents().collect()
    }
    return order, seen, docs


def _check_against_oracle(run: CrawlRun, oracle):
    order, seen, docs = _invariants(run)
    assert order == sorted(oracle.order), "crawl ordering diverged"
    assert seen == oracle.seen, "URL-seen set diverged"
    assert docs == {k: [tuple(s) for s in v] for k, v in oracle.documents.items()}, (
        "span sequences diverged"
    )
    # spans well-formed: offsets strictly increasing, kinds from vocabulary
    for spans in docs.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        assert {s[0] for s in spans} <= {"title", "description", "author", "date", "keyword", "media"}


def test_crawl_matches_oracle(spark, oracle):
    run = CrawlRun(
        spark, tempfile.mkdtemp(prefix="crawl_t_"),
        CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS),
    )
    run.run(seeds=_seed_df(spark))
    _check_against_oracle(run, oracle)
    # 1->N fan-out actually exercised: some fetched records emit sample
    # docs (doc_id = url_hash#sK) alongside their dataset doc, and every
    # sample doc's parent dataset doc exists
    _, _, docs = _invariants(run)
    sample_ids = [d for d in docs if "#s" in d]
    assert len(sample_ids) > 0
    assert all(d.split("#")[0] in docs for d in sample_ids)


def test_crawl_resume_replays_exactly(spark, oracle):
    """Kill after round 0 (simulated by max_rounds=1), resume to the full
    horizon: identical invariants to an uninterrupted run — the
    insert_last_updated / tmp+rename resume protocol analog."""
    d = tempfile.mkdtemp(prefix="crawl_r_")
    run1 = CrawlRun(spark, d, CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=1))
    run1.run(seeds=_seed_df(spark))
    assert run1.committed_rounds() == [0]
    run2 = CrawlRun(spark, d, CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS))
    run2.run(resume=True)
    assert run2.committed_rounds() == list(range(ROUNDS))
    _check_against_oracle(run2, oracle)


def test_resume_overwrites_uncommitted_partial_round(spark, oracle):
    """A crash mid-round leaves data files without the _COMMIT marker;
    resume must ignore and cleanly overwrite them (the
    delete-on-failure/invalidated-run analog,
    ncbi_geo_crawler/files/ndjson.py:17-23)."""
    import os

    d = tempfile.mkdtemp(prefix="crawl_x_")
    run1 = CrawlRun(spark, d, CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=1))
    run1.run(seeds=_seed_df(spark))
    # fabricate a partial, uncommitted round 1: stale garbage data, no marker
    partial = os.path.join(d, "round=0001")
    os.makedirs(os.path.join(partial, "documents"), exist_ok=True)
    spark.createDataFrame([("junk",)], "doc_id string").write.mode("overwrite").parquet(
        os.path.join(partial, "documents")
    )
    run2 = CrawlRun(spark, d, CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS))
    assert run2.committed_rounds() == [0]  # partial round invisible
    run2.run(resume=True)
    _check_against_oracle(run2, oracle)


def test_crawl_frontier_delta_mode_matches_oracle(spark, oracle):
    """O(delta) frontier persistence (frontier_add/remove + periodic
    compaction) must be indistinguishable from snapshot mode — including
    resume across the compaction boundary."""
    d = tempfile.mkdtemp(prefix="crawl_d_")
    cfg = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=2,
                      frontier_deltas=True, compact_every=2)
    run1 = CrawlRun(spark, d, cfg)
    run1.run(seeds=_seed_df(spark))
    # resume past the round-1 compaction snapshot
    cfg3 = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS,
                       frontier_deltas=True, compact_every=2)
    run2 = CrawlRun(spark, d, cfg3)
    run2.run(resume=True)
    _check_against_oracle(run2, oracle)
    import os

    assert os.path.isdir(os.path.join(d, "round=0001", "frontier_compact"))
    assert not os.path.isdir(os.path.join(d, "round=0000", "frontier_next"))


def test_crawl_order_independent_of_partitioning(spark, oracle):
    """Same crawl at a different shuffle-partition count, salt factor and
    bloom prefilter: byte-identical ordering/seen/docs — the sandbox
    proxy for N-vs-4N executor determinism (the full local[8]/local[32]
    two-process evidence lives in bench.py)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        run = CrawlRun(
            spark, tempfile.mkdtemp(prefix="crawl_p_"),
            CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS,
                        salt_factor=3, use_bloom=True),
        )
        run.run(seeds=_seed_df(spark))
        _check_against_oracle(run, oracle)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_retry_after_cooldown_matches_oracle(spark):
    """Retry-After feedback actually exercised: max_attempts=1 on a
    single-host frontier makes final-429s happen (verified below), the
    429'd host is barred for ceil(ra/round_seconds) rounds on BOTH sides,
    and ordering/seen still match exactly. Without the Spark-side
    feedback loop the crawl order diverges here."""
    seeds = [
        {"url": f"https://host-0000.example.org/records/{i}", "priority": i % 10}
        for i in range(200)
    ]
    oracle = crawl_oracle(seeds, 10, round_seconds=4, max_rounds=6, max_attempts=1)
    f429 = [x for x in oracle.failures if x[2] == 429]
    assert len(f429) > 0  # the scenario must actually hit the 429 path

    run = CrawlRun(
        spark, tempfile.mkdtemp(prefix="crawl_ra_"),
        CrawlConfig(num_hosts=10, round_seconds=4, max_rounds=6, max_attempts=1),
    )
    run.run(seeds=spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], ["url", "priority"]))
    order = [
        (r["round"], r["priority"], r["seq"], r["url_hash"])
        for r in run.crawl_order().select("round", "priority", "seq", "url_hash").collect()
    ]
    assert order == sorted(oracle.order), "crawl ordering diverged under cooldown"
    assert {r["url_hash"] for r in run.seen().collect()} == oracle.seen
    # the ledger recorded the cooldown
    hs = run.host_state()
    assert hs.filter(hs.next_allowed_round > 0).count() > 0


def test_crawl_bloom_segments_equal_full_rebuild(spark, oracle):
    """The round-committed incremental bloom-segment table (segments(r)
    = segments(r-1) OR build(delta_r)) must be BYTE-identical to
    rebuilding from the crawl's full seen set — the invariant that lets
    each round commit only its delta. Also pins that the e2e path runs
    bloom-ON (CrawlConfig default) and still matches the oracle."""
    import os

    from nde_crawlers_spark.operators import seen as SN

    d = tempfile.mkdtemp(prefix="crawl_bl_")
    cfg = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS)
    assert cfg.use_bloom  # bloom is the shipped default
    run = CrawlRun(spark, d, cfg)
    run.run(seeds=_seed_df(spark))
    _check_against_oracle(run, oracle)

    last = run.committed_rounds()[-1]
    seg_dir = os.path.join(d, f"round={last:04d}", "bloom_segments")
    assert os.path.isdir(seg_dir)
    committed = {
        r["seg"]: (r["bits"], r["nbits"], r["nhashes"])
        for r in spark.read.parquet(seg_dir).collect()
    }
    rebuilt = {
        r["seg"]: (r["bits"], r["nbits"], r["nhashes"])
        for r in SN.build_bloom_segments(
            run.seen().select("url_hash"),
            nseg=cfg.bloom_segments, expected=cfg.bloom_expected, fpp=cfg.bloom_fpp,
        ).collect()
    }
    assert committed == rebuilt
