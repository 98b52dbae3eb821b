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


def test_autothrottle_adapts_budgets(spark):
    """AutoThrottle wired into the LIVE scheduler (r4 task 1): after a
    crawl, systematically slow hosts (synth_latency_ms host bias) carry
    a larger adapted delay than fast hosts, and feeding the committed
    host_state back through with_host_budget SHRINKS a slow host's
    next-round budget below its politeness-only budget while a fast
    host with a real crawl-delay keeps its budget unchanged. The crawl
    itself stays oracle-exact with autothrottle ON (the latencies are
    corpus data, not wall-clock)."""
    import os

    from nde_crawlers_spark.operators import frontier as FR
    from nde_crawlers_spark.sources.synthetic import _frac, robots_rules

    n_hosts, n_seeds = 20, 160
    seeds = make_seeds(n_seeds, n_hosts)
    # start at the FLOOR (not the shipped 5s START_DELAY default): this
    # test asserts adaptation DIRECTION from a common floor — a fast
    # host's budget must stay at politeness while a slow host's
    # shrinks. With the 5s start both classes begin throttled and the
    # fast host has not descended to the floor after 2 rounds; the
    # START_DELAY behavior has its own test below.
    orc = crawl_oracle(seeds, n_hosts, round_seconds=2, max_rounds=2,
                       at_start_delay_ms=None)
    d = tempfile.mkdtemp(prefix="crawl_at_")
    cfg = CrawlConfig(num_hosts=n_hosts, round_seconds=2, max_rounds=2,
                      at_start_delay_ms=None)
    assert cfg.autothrottle  # autothrottle is the shipped default
    run = CrawlRun(spark, d, cfg)
    run.run(seeds=spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], ["url", "priority"]))
    order = [
        (r["round"], r["priority"], r["seq"], r["url_hash"])
        for r in run.crawl_order().select("round", "priority", "seq", "url_hash").collect()
    ]
    assert order == sorted(orc.order)
    assert {r["url_hash"] for r in run.seen().collect()} == orc.seen

    last = run.committed_rounds()[-1]
    robots = spark.read.parquet(os.path.join(d, f"round={last:04d}", "robots_cache"))
    state = spark.read.parquet(os.path.join(d, f"round={last:04d}", "host_state"))
    at = {r["host"]: r["at_delay_ms"] for r in state.collect()}
    slow = {h for h in at if _frac("lat-host:" + h) < 0.25}
    fast = set(at) - slow
    assert slow and fast, "fixture must exercise both latency classes"
    assert min(at[h] for h in slow) > max(at[h] for h in fast)

    hosts = state.select("host")
    with_at = {
        r["host"]: r["host_budget"]
        for r in FR.with_host_budget(
            hosts, robots, 2, host_state=state, current_round=last + 1
        ).collect()
    }
    plain = {
        r["host"]: r["host_budget"]
        for r in FR.with_host_budget(
            hosts, robots, 2, host_state=state.drop("at_delay_ms"), current_round=last + 1
        ).collect()
    }
    # throttling only ever lowers budgets (delay floor can only rise)
    assert all(with_at[h] <= plain[h] for h in with_at)
    crawl_delay = {h: robots_rules(h)["crawl_delay_ms"] for h in at}
    for h in slow:
        if crawl_delay[h] <= 500:
            assert with_at[h] < plain[h], f"slow host {h} budget did not shrink"
    for h in fast:
        if crawl_delay[h] >= 500:
            assert with_at[h] == plain[h], f"fast host {h} budget changed"


def test_crawl_bloom_adapts_to_seen_growth(spark, oracle):
    """Adaptive segment sizing: with a deliberately-undersized
    ``bloom_expected``, the committed key count outgrows the persisted
    bit arrays mid-crawl and the round commit REBUILDS (larger nbits,
    2x-headroom sizing) instead of OR-ing into a saturating filter. The
    final table must still equal a from-scratch build at the adaptive
    size, and the crawl itself stays oracle-exact."""
    import json
    import os

    from nde_crawlers_spark.operators import seen as SN

    d = tempfile.mkdtemp(prefix="crawl_grow_")
    # round 0 commits ~N_SEEDS keys, later rounds add outlink URLs.
    # nseg=2 keeps per-segment counts above _seg_params' 64-key floor,
    # so the growing seen set genuinely outgrows the round-0 sizing and
    # the fpp budget forces a resize rebuild mid-crawl.
    cfg = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS,
                      bloom_expected=32, bloom_segments=2)
    run = CrawlRun(spark, d, cfg)
    run.run(seeds=_seed_df(spark))
    _check_against_oracle(run, oracle)

    rounds = run.committed_rounds()
    sizes, totals = [], []
    total = 0
    for r in rounds:
        with open(os.path.join(d, f"round={r:04d}", "_COMMIT")) as f:
            total += json.load(f)["new_seen"]
        totals.append(total)
        segs = spark.read.parquet(os.path.join(d, f"round={r:04d}", "bloom_segments"))
        sizes.append(SN.segments_sizing(segs))
    # growth actually triggered at least one resize rebuild
    assert sizes[-1][1] > sizes[0][1], f"no adaptive rebuild happened: {sizes}"
    # every committed geometry satisfies the fpp budget for its own
    # committed key count (the adaptive guarantee)
    for (nseg, nbits, _k), tot in zip(sizes, totals):
        need_nbits, _ = SN._seg_params(max(cfg.bloom_expected, tot), nseg, cfg.bloom_fpp)
        assert nbits >= need_nbits, (nbits, need_nbits, tot)
    # final table == full rebuild at the adaptive size it was born with
    last = rounds[-1]
    committed = {
        r["seg"]: (r["bits"], r["nseg"], r["nbits"], r["nhashes"])
        for r in spark.read.parquet(
            os.path.join(d, f"round={last:04d}", "bloom_segments")
        ).collect()
    }
    rebuilt = {
        r["seg"]: (r["bits"], r["nseg"], r["nbits"], r["nhashes"])
        for r in SN.build_bloom_segments(
            run.seen().select("url_hash"), nseg=cfg.bloom_segments,
            fpp=cfg.bloom_fpp, sizing=(sizes[-1][1], sizes[-1][2]),
        ).collect()
    }
    assert committed == rebuilt


def test_crawl_bloom_nseg_change_on_resume_rebuilds(spark, oracle):
    """The r4 ADVICE resume hazard: a resume under a DIFFERENT
    bloom_segments must not probe the old table with new-config routing
    (bloom false negatives -> re-enqueued seen URLs). The persisted
    geometry makes probes route by the table's own nseg, and the next
    commit rebuilds under the new config — crawl stays oracle-exact
    and the final table carries the new segment count."""
    import os

    from nde_crawlers_spark.operators import seen as SN

    d = tempfile.mkdtemp(prefix="crawl_nseg_")
    cfg1 = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=1,
                       bloom_segments=16)
    CrawlRun(spark, d, cfg1).run(seeds=_seed_df(spark))

    cfg2 = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS,
                       bloom_segments=4)
    run2 = CrawlRun(spark, d, cfg2)
    run2.run(resume=True)
    _check_against_oracle(run2, oracle)
    last = run2.committed_rounds()[-1]
    segs = spark.read.parquet(os.path.join(d, f"round={last:04d}", "bloom_segments"))
    assert SN.segments_sizing(segs)[0] == 4


def test_autothrottle_fast_host_budget_grows_from_start_delay(spark):
    """Scrapy's AUTOTHROTTLE_START_DELAY separated from the floor: with
    a high start delay (5s), every host begins throttled; across
    observations a FAST host's adapted delay shrinks toward the floor —
    its with_host_budget output GROWS back to the politeness budget —
    while a slow host stays pinned near 1. The crawl remains
    oracle-exact with the same start parameter."""
    import os

    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators import frontier as FR
    from nde_crawlers_spark.sources.synthetic import robots_rules

    n_hosts, n_seeds = 20, 240
    seeds = make_seeds(n_seeds, n_hosts)
    orc = crawl_oracle(seeds, n_hosts, round_seconds=2, max_rounds=2,
                       at_start_delay_ms=5000.0)
    d = tempfile.mkdtemp(prefix="crawl_sd_")
    cfg = CrawlConfig(num_hosts=n_hosts, round_seconds=2, max_rounds=2,
                      at_start_delay_ms=5000.0)
    run = CrawlRun(spark, d, cfg)
    run.run(seeds=spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], ["url", "priority"]))
    order = [
        (r["round"], r["priority"], r["seq"], r["url_hash"])
        for r in run.crawl_order().select("round", "priority", "seq", "url_hash").collect()
    ]
    assert order == sorted(orc.order)
    assert {r["url_hash"] for r in run.seen().collect()} == orc.seen

    last = run.committed_rounds()[-1]
    robots = spark.read.parquet(os.path.join(d, f"round={last:04d}", "robots_cache"))
    state = spark.read.parquet(os.path.join(d, f"round={last:04d}", "host_state"))
    hosts = state.select("host")
    # budget at the START delay (pre-observation) vs after adaptation
    seeded = state.withColumn("at_delay_ms", F.lit(5000.0))

    def budgets(st):
        return {
            r["host"]: r["host_budget"]
            for r in FR.with_host_budget(
                hosts, robots, 2, host_state=st, current_round=last + 1
            ).collect()
        }

    b_start, b_adapted = budgets(seeded), budgets(state)
    at = {r["host"]: r["at_delay_ms"] for r in state.collect()}
    crawl_delay = {h: robots_rules(h)["crawl_delay_ms"] for h in at}
    from nde_crawlers_spark.sources.synthetic import _frac as fr_
    fast = [h for h in at if fr_("lat-host:" + h) >= 0.25 and crawl_delay[h] <= 500]
    slow = [h for h in at if fr_("lat-host:" + h) < 0.25 and crawl_delay[h] <= 500]
    assert fast and slow
    # a fast host that got observations has adapted DOWN -> budget GREW
    grew = [h for h in fast if b_adapted[h] > b_start[h]]
    assert grew, (at, b_start, b_adapted)
    # slow hosts stay near the start-delay budget (delay >= ~1300ms)
    for h in slow:
        assert at[h] > 1000.0, (h, at[h])


def test_crawl_cuckoo_seen_filter_matches_oracle(spark, oracle):
    """The crawl's membership prefilter is pluggable (north rule:
    'partitioned cuckoo/bloom URL-seen filter'): with
    seen_filter='cuckoo' the rounds maintain per-segment cuckoo tables
    (insert-per-round, capacity-checked) instead of bloom segments, and
    the crawl stays byte-identical to the oracle. The committed table
    has NO false negatives for the full seen set (incremental inserts
    preserve membership even when eviction walks spill to the stash)."""
    import os

    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators import cuckoo as CK

    d = tempfile.mkdtemp(prefix="crawl_ck_")
    cfg = CrawlConfig(num_hosts=N_HOSTS, round_seconds=2, max_rounds=ROUNDS,
                      seen_filter="cuckoo", bloom_segments=8, bloom_expected=4096)
    run = CrawlRun(spark, d, cfg)
    run.run(seeds=_seed_df(spark))
    _check_against_oracle(run, oracle)
    last = run.committed_rounds()[-1]
    segs = spark.read.parquet(os.path.join(d, f"round={last:04d}", "cuckoo_segments"))
    assert CK.cuckoo_segments_sizing(segs)[0] == 8
    probed = CK.probe_cuckoo_segmented(run.seen().select("url_hash"), segs)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0
    # and no bloom table was written in cuckoo mode
    assert not os.path.isdir(os.path.join(d, f"round={last:04d}", "bloom_segments"))


def test_crawl_recrawl_ttl_in_loop(spark):
    """TTL recrawl INSIDE the crawl loop (cfg.recrawl_ttl_rounds, the
    figshare EXPIRE analog): keys seen >= ttl rounds ago leave the
    active seen set and their fingerprints are evicted from the
    committed cuckoo segments via the guarded delete — so a
    re-discovered expired URL is genuinely RE-FETCHED by a later round.

    Corpus: a closed ring of 16 URLs over 2 hosts where every page
    links to the next two ring members (ring small enough to wrap within the run) — re-discovery of expired keys
    is guaranteed, unlike the open synthetic URL space. Asserts, for
    BOTH frontier modes (snapshot and delta): re-fetches happen, never
    before expiry, identical order/seen/docs across modes, expired-and-
    not-refreshed fingerprints absent from the committed segments while
    every active key still probes present, and the commit meta carries
    the guarded-delete rebuild counter."""
    import os

    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators import cuckoo as CK

    RING, HOSTS, TTL, ROUNDS_TTL = 8, 2, 2, 8

    class RingFetcher:
        """Deterministic closed-world fetcher: /records/i links to
        i+1, i+2 (mod RING), alternating hosts; allow-all robots."""

        def __call__(self, url: str) -> dict:
            i = int(url.rsplit("/", 1)[1])
            links = "".join(
                f'<a href="https://h{(i + k) % HOSTS}.example.org/records/{(i + k) % RING}"></a>'
                for k in (1, 2)
            )
            body = (
                f"<html><body><h1>ring {i}</h1><p>ring page {i} of the closed "
                f"corpus</p>{links}</body></html>"
            )
            return {
                "status": 200, "attempts": 1, "kind": "html", "body": body,
                "bytes": len(body), "retry_after_s": 0, "latency_ms": 10.0,
            }

        def robots_txt(self, host: str) -> str:
            return ""  # allow-all

    seeds = spark.createDataFrame(
        [(f"https://h{i % HOSTS}.example.org/records/{i}", 0) for i in range(4)],
        ["url", "priority"],
    )
    results = {}
    for mode, extra in (("snapshot", {}), ("delta", {"frontier_deltas": True, "compact_every": 2})):
        d = tempfile.mkdtemp(prefix=f"crawl_ttl_{mode}_")
        cfg = CrawlConfig(
            num_hosts=HOSTS, round_seconds=2, max_rounds=ROUNDS_TTL,
            seen_filter="cuckoo", bloom_segments=4, bloom_expected=2048,
            recrawl_ttl_rounds=TTL, autothrottle=False,
            fetcher=RingFetcher(), **extra,
        )
        run = CrawlRun(spark, d, cfg)
        metas = run.run(seeds=seeds)
        order = [
            (r["round"], r["url_hash"])
            for r in run.crawl_order().select("round", "url_hash").collect()
        ]
        # re-fetches happened, and never before the TTL horizon
        by_key: dict[str, list[int]] = {}
        for rnd, h in order:
            by_key.setdefault(h, []).append(rnd)
        refetched = {h: rs for h, rs in by_key.items() if len(rs) > 1}
        assert refetched, "ring corpus must re-fetch expired URLs"
        for h, rs in by_key.items():
            for a, b in zip(rs, rs[1:]):
                assert b - a >= TTL, (h, rs, "re-fetched before expiry")
        # guarded-delete observability in the commit meta
        assert all("cuckoo_rebuilds_total" in m for m in metas[TTL:])
        assert metas[-1]["cuckoo_rebuilds_total"] >= 0
        # committed segments: active keys all present; keys whose NEWEST
        # sighting has expired are deleted (deterministic corpus ->
        # deterministic probe outcome)
        last = run.committed_rounds()[-1]
        segs = spark.read.parquet(os.path.join(d, f"round={last:04d}", "cuckoo_segments"))
        newest = run.seen().groupBy("url_hash").agg(
            F.max("first_seen_round").alias("fsr"))
        horizon = last - TTL
        active = newest.filter(F.col("fsr") > horizon)
        expired = newest.filter(F.col("fsr") <= horizon)
        assert expired.count() > 0
        probed_active = CK.probe_cuckoo_segmented(active.select("url_hash"), segs)
        assert probed_active.filter(~F.col("__maybe_seen")).count() == 0
        probed_exp = CK.probe_cuckoo_segmented(expired.select("url_hash"), segs)
        assert probed_exp.filter(F.col("__maybe_seen")).count() == 0
        results[mode] = (
            sorted(order),
            {r["url_hash"] for r in run.seen().collect()},
            sorted(
                (r["doc_id"], str(r["spans"]))
                for r in run.documents().collect()
            ),
        )
    assert results["snapshot"] == results["delta"], "TTL crawl diverged across frontier modes"
