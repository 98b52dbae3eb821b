"""The crawl plan: checkpointed, resumable frontier rounds.

This is the engine's flagship pipeline — the Spark-first replacement for
the reference's whole crawler fleet (Scrapy scheduler + downloader +
pipelines per container, README.md:10-27) and its resume protocol
(SQLite checkpoint ``insert_last_updated(until)`` after each completed
harvest window, figshare_oai-pmh/files/sql_database.py:415-470, plus the
tmp+rename atomic NDJSON commit, zenodo/files/ndjson.py:50-72).

Model: bulk-synchronous rounds. Each round
    candidates -> canonicalize -> dedupe -> unseen-filter -> robots ->
    politeness top-k per host -> fetch (Arrow batches) -> parse to spans
    -> commit {selected, documents, new_seen, frontier, outlinks,
               robots_cache, lineage} + _COMMIT marker
The marker is written last via tmp+rename — the same
data-before-release ordering the reference uses so bad data never
propagates (README.md:88-97). A killed run resumes from the last round
whose marker exists; uncommitted partials are overwritten.

Determinism (north rule: identical crawl ordering + seen set at N vs 4N
executors): every decision is a pure function of URL strings —
priority/seq/url_hash sort keys, pure-function robots and fetch corpus,
partitioning-independent dedup (min_by, not dropDuplicates). Crawl order
is the sequence of fetched URLs ordered by (round, priority, seq,
url_hash).

Scale notes (10^10 URLs): in production the per-round state tables are
Iceberg — ``url_seen`` bucketed by url_hash (co-partitioned anti-join),
frontier MERGE'd as deltas instead of snapshot-rewritten, lineage rows
appended per snapshot. The sandbox uses parquet round directories with
identical semantics; the plan shapes (anti-join, broadcast robots,
two-phase top-k, mapInPandas fetch) are what carry to the cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import urls as U
from ..operators import cuckoo as CK
from ..operators import frontier as FR
from ..operators import seen as SN
from ..operators.fetch import fetch_parse

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_ms", T.IntegerType()),
    ]
)

FRONTIER_COLS = [
    "url_hash", "priority", "seq", "url", "canonical_url", "host", "host_bucket", "path",
]


@dataclass
class CrawlConfig:
    num_hosts: int = 50
    round_seconds: int = 2          # politeness budget window per round
    max_rounds: int = 5
    max_attempts: int = 3
    discovered_priority: int = 5
    host_buckets: int = U.DEFAULT_HOST_BUCKETS
    # segmented bloom prefilter in front of the seen anti-join: per-
    # url_hash-bucket bloom segments, built executor-side, persisted in
    # each round's commit beside the seen delta and maintained
    # INCREMENTALLY (segments(r) = segments(r-1) OR build(new_seen_r)) —
    # the north rule's partitioned URL-seen filter; no driver-side
    # combine anywhere (operators/seen.py)
    use_bloom: bool = True
    # which partitioned membership filter fronts the seen anti-join:
    # "bloom" (append-only, OR-maintained) or "cuckoo" (deletable —
    # the TTL-recrawl path, operators/cuckoo.py). Both share the
    # segment-count / design-capacity knobs below; use_bloom=False
    # disables the prefilter entirely (exact anti-join only).
    seen_filter: str = "bloom"
    # TTL recrawl inside the loop (figshare EXPIRE analog,
    # figshare_oai-pmh/files/sql_database.py:75): a key first seen in
    # round f EXPIRES at round f + recrawl_ttl_rounds — it leaves the
    # ACTIVE seen set (the URL reads as unseen again when re-discovered)
    # and, with seen_filter="cuckoo", its fingerprint is deleted from
    # the persisted segments under the live-key guard
    # (operators/cuckoo.py::delete_from_cuckoo_segments). Expiry is a
    # pure function of (first_seen_round, current round), so resume
    # reconstruction recomputes the identical active set at any
    # parallelism. None (default) = keys never expire.
    recrawl_ttl_rounds: int | None = None
    bloom_segments: int = 64         # segment count (10^10 design point: 4096)
    bloom_expected: int = 1_000_000  # TOTAL expected keys across segments
    bloom_fpp: float = 0.01
    salt_factor: int = 8
    # AutoThrottle (every reference crawler ships AUTOTHROTTLE_ENABLED=
    # True, TARGET_CONCURRENCY=1.0 over DOWNLOAD_DELAY=0.5s — e.g.
    # bei_crawler/files/settings.py:2-5): each host's delay adapts to
    # its observed fetch latencies by the Scrapy recurrence
    #   target = latency/C
    #   next = clamp(max(target, (delay + target)/2), base, max)
    #   (non-200 responses may only RAISE the delay, never lower it;
    #   the max(target, mean) step is Scrapy's: one very slow response
    #   jumps the delay to its full target, not halfway)
    # folded per host over the round's fetches in crawl order. The
    # latencies are deterministic corpus DATA (sources/synthetic.py::
    # synth_latency_ms), not wall-clock, so scheduling stays
    # bit-identical at any parallelism (north-rule N-vs-4N invariant);
    # in production the same fold consumes measured latencies.
    autothrottle: bool = True
    at_base_delay_ms: float = 500.0        # clamp FLOOR (DOWNLOAD_DELAY analog)
    at_max_delay_ms: float = 60_000.0
    at_concurrency: float = 1.0
    # Scrapy separates AUTOTHROTTLE_START_DELAY (5s) from the floor: a
    # new host starts throttled and earns its budget back as it proves
    # fast (delay adapts DOWN toward the floor), while slow hosts stay
    # throttled. 5000.0 is the Scrapy default no reference crawler
    # overrides (r5 shipped None = start-at-floor for signature
    # stability; r6 re-derived the oracle signatures instead).
    # None = start at the floor.
    #
    # Deliberate model difference, documented: Scrapy applies
    # START_DELAY from a slot's FIRST request; this round-based model
    # applies it as the SEED of the first latency fold, so a host's
    # first-round budget is still set by the robots/default floor and
    # the start delay binds from round 2. Rationale: Scrapy has no
    # round budgets to start from — mapping "slot created at 5s" onto
    # "first-round budget = floor(round/5s) = 1" would conflate the
    # scheduler models; the fold-seed form preserves Scrapy's observable
    # property (a new host must PROVE fast before its rate rises above
    # the start level) one round later. The Python oracle mirrors this
    # exactly.
    at_start_delay_ms: float | None = 5000.0
    # frontier persistence: False = full snapshot per round (simple,
    # sandbox default); True = O(delta) writes per round (frontier_add +
    # frontier_remove) with a full compaction snapshot every
    # ``compact_every`` rounds — the Iceberg-MERGE-shaped scale path
    # (PLANS.md shuffle inventory).
    frontier_deltas: bool = False
    compact_every: int = 4
    # injectable fetch body (operators/fetch.py contract): None = the
    # deterministic synthetic corpus; operators/http_fetch.HttpFetcher
    # (or a proxy wrapper) puts real sockets behind the SAME plan. If
    # the callable also exposes ``robots_txt(host) -> str``, robots
    # bodies come from it too (_update_robots).
    fetcher: Callable[[str], dict] | None = None
    extra: dict = field(default_factory=dict)


class ConcurrentRunError(RuntimeError):
    """Another live process holds this run directory's single-flight lock."""


class CrawlRun:
    """One named crawl run rooted at ``run_dir`` (created if missing).

    Single-flight: ``run()`` takes an exclusive lock file (the ``flock``
    analog of the reference's cron-driven dumpers — two overlapping runs
    would double-fetch and corrupt round state). The lock records the
    holder's pid; a lock whose pid is dead is STALE and silently
    reclaimed (crash recovery), a lock whose pid is alive raises
    ``ConcurrentRunError``."""

    def __init__(self, spark: SparkSession, run_dir: str, config: CrawlConfig | None = None):
        self.spark = spark
        self.run_dir = run_dir
        self.cfg = config or CrawlConfig()
        # cumulative committed seen-key count (from round metas) —
        # adaptive bloom sizing input; _run_locked refreshes it on resume.
        # With TTL recrawl it counts ALL keys ever seen (expired included)
        # — a deliberate overcount that only makes capacity rebuilds fire
        # earlier, never lets the filter overload.
        self._seen_total = 0
        # guarded-delete observability: +1 per segment rebuilt because a
        # fingerprint collision evicted a live key (reporting-grade)
        self.cuckoo_rebuilds = spark.sparkContext.accumulator(0)
        os.makedirs(run_dir, exist_ok=True)

    # ---------- single-flight lock ----------
    @property
    def _lock_path(self) -> str:
        return os.path.join(self.run_dir, "_LOCK")

    def _acquire_lock(self) -> None:
        """Create-or-reclaim under an flock'd guard file.

        The naive unlink/recreate reclaim has a race: two processes that
        both read the same dead pid both unlink — A can unlink the FRESH
        lock B just created, and two runs proceed concurrently. The whole
        examine/reclaim/create sequence therefore runs inside an
        exclusive flock on a persistent sidecar (never unlinked, so its
        inode is stable and the classic flock-then-unlink race can't
        occur). Liveness semantics are unchanged: the lock file records
        the holder's pid; dead pid == stale == reclaimed."""
        import fcntl

        guard = os.open(self._lock_path + ".guard", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(guard, fcntl.LOCK_EX)  # short critical section
            while True:
                try:
                    fd = os.open(self._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    with os.fdopen(fd, "w") as f:
                        json.dump({"pid": os.getpid(), "acquired_at": time.time()}, f)
                        f.flush()
                        os.fsync(f.fileno())
                    return
                except FileExistsError:
                    try:
                        with open(self._lock_path) as f:
                            holder = json.load(f)
                        pid = int(holder.get("pid", -1))
                    except (OSError, ValueError):
                        pid = -1  # unreadable/corrupt lock -> treat as stale
                    if pid > 0 and self._pid_alive(pid):
                        raise ConcurrentRunError(
                            f"run_dir {self.run_dir} is locked by live pid {pid}"
                        )
                    # stale (dead holder): reclaim — safe, we hold the guard
                    try:
                        os.unlink(self._lock_path)
                    except FileNotFoundError:
                        pass
        finally:
            fcntl.flock(guard, fcntl.LOCK_UN)
            os.close(guard)

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists but owned elsewhere

    def _release_lock(self) -> None:
        try:
            os.unlink(self._lock_path)
        except FileNotFoundError:
            pass

    # ---------- checkpoint layout ----------
    def _rdir(self, r: int) -> str:
        return os.path.join(self.run_dir, f"round={r:04d}")

    def _marker(self, r: int) -> str:
        return os.path.join(self._rdir(r), "_COMMIT")

    def committed_rounds(self) -> list[int]:
        out = []
        if not os.path.isdir(self.run_dir):
            return out
        for d in sorted(os.listdir(self.run_dir)):
            if d.startswith("round=") and os.path.exists(
                os.path.join(self.run_dir, d, "_COMMIT")
            ):
                out.append(int(d.split("=")[1]))
        return out

    def _commit(self, r: int, meta: dict) -> None:
        """Atomic round commit: write marker content to tmp, rename last."""
        tmp = self._marker(r) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._marker(r))

    def _meta(self, r: int) -> dict:
        """A committed round's meta (the _COMMIT marker's JSON body)."""
        with open(self._marker(r)) as f:
            return json.load(f)

    def _write(self, df: DataFrame, r: int, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self._rdir(r), name))

    def _read(self, r: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._rdir(r), name))

    # ---------- candidate preparation ----------
    def _prepare_candidates(self, raw: DataFrame) -> DataFrame:
        """raw(url, priority) -> canonicalized, deduped candidate rows."""
        df = U.with_url_columns(raw, num_buckets=self.cfg.host_buckets)
        df = df.filter(U.url_scheme(F.col("url")).isin("http", "https"))
        df = df.withColumn("seq", U.hash_seq(F.col("canonical_url")))
        df = df.select(*FRONTIER_COLS)
        return FR.dedupe_candidates(df)

    # ---------- robots ----------
    def _update_robots(self, robots: DataFrame, candidates: DataFrame) -> DataFrame:
        """Fetch robots.txt BODIES for hosts not yet in the cache and run
        them through the real parser (operators/robots.py::
        parse_robots_txt) — the full ROBOTSTXT_OBEY loop, not a shortcut
        to the rules (the robots_cache incremental-table analog of the
        reference's HTTPCACHE, ncbi_geo_crawler/files/settings.py:31-35).
        """
        from ..operators.robots import parse_robots_txt
        from ..sources.synthetic import render_robots_txt

        new_hosts = (
            candidates.select("host").distinct().join(robots, "host", "left_anti")
        )
        robots_body = getattr(self.cfg.fetcher, "robots_txt", None) or render_robots_txt

        def _fetch_robots(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for h in pdf["host"]:
                    r = parse_robots_txt(robots_body(h))
                    rows.append((h, r["disallow_prefixes"], r["crawl_delay_ms"]))
                yield pd.DataFrame(rows, columns=["host", "disallow_prefixes", "crawl_delay_ms"])

        fetched = new_hosts.mapInPandas(_fetch_robots, schema=ROBOTS_SCHEMA)
        return robots.unionByName(fetched)

    # ---------- the round ----------
    def _run_round(
        self,
        r: int,
        candidates_raw: DataFrame,
        frontier: DataFrame,
        seen: DataFrame,
        robots: DataFrame,
    ) -> dict:
        cfg = self.cfg
        t0 = time.monotonic()

        cand = self._prepare_candidates(candidates_raw)
        robots = self._update_robots(robots, cand).cache()

        # TTL expiry (cfg.recrawl_ttl_rounds): restrict to the ACTIVE
        # seen set before any seen-dependent step. ``seen`` is always
        # the FULL reconstruction (_seen_through), so filtering by
        # horizon here — rather than mutating persisted state — keeps
        # expiry idempotent across resume at any parallelism. A key
        # re-fetched after expiry re-enters new_seen with the current
        # round, so only its newest row survives the horizon filter.
        expired_new = None
        if cfg.recrawl_ttl_rounds is not None:
            horizon = r - cfg.recrawl_ttl_rounds
            if horizon >= 0:
                # rows hitting the horizon EXACTLY this round drive the
                # segment delete below (earlier rows were deleted by
                # earlier rounds; committed segments persist post-delete)
                expired_new = seen.filter(F.col("first_seen_round") == F.lit(horizon))
                seen = seen.filter(F.col("first_seen_round") > F.lit(horizon))

        # unseen filter: candidates never enqueued before. With
        # use_bloom, candidates are probed against the PREVIOUS round's
        # persisted bloom-segment table (each candidate against its own
        # segment only); definite-new rows skip the anti-join entirely,
        # might-contain rows are confirmed exactly — identical output
        # set either way, at any parallelism.
        mode = cfg.seen_filter if cfg.use_bloom else "exact"
        seg_table = {"bloom": "bloom_segments", "cuckoo": "cuckoo_segments"}.get(mode)
        prev_segments = None
        if seg_table and r > 0 and os.path.isdir(
            os.path.join(self._rdir(r - 1), seg_table)
        ):
            prev_segments = self._read(r - 1, seg_table)
            # a table from before the self-describing schema (no nseg
            # column) cannot be probed safely — its routing geometry is
            # unknown; drop it and probe/rebuild from the full seen set
            if "nseg" not in prev_segments.columns:
                prev_segments = None
        ttl_deleted_segments = None
        if mode == "cuckoo" and prev_segments is not None and expired_new is not None:
            # evict this round's newly-expired fingerprints BEFORE the
            # probe, under the live-key guard (live = the active seen
            # set — the complete post-delete membership). Cached: the
            # post-delete table feeds both the probe and the insert/
            # commit below, and the guarded delete is the expensive step.
            prev_segments = CK.delete_from_cuckoo_segments(
                prev_segments, expired_new.select("url_hash"),
                live=seen.select("url_hash"),
                rebuild_counter=self.cuckoo_rebuilds,
            ).cache()
            ttl_deleted_segments = prev_segments
        if mode == "bloom":
            unseen = SN.filter_unseen_bloom_segmented(
                cand, seen, segments=prev_segments, nseg=cfg.bloom_segments,
                expected=cfg.bloom_expected, fpp=cfg.bloom_fpp,
            )
        elif mode == "cuckoo":
            unseen = CK.filter_unseen_cuckoo_segmented(
                cand, seen, segments=prev_segments, nseg=cfg.bloom_segments,
                capacity=cfg.bloom_expected,
            )
        else:
            unseen = SN.filter_unseen_exact(cand, seen)
        unseen = unseen.cache()
        new_seen = unseen.select("url_hash").withColumn("first_seen_round", F.lit(r))

        allowed = FR.robots_filter(unseen, robots)
        frontier_all = frontier.unionByName(allowed.select(*FRONTIER_COLS)).cache()

        # Retry-After feedback: the prior round's host_state carries
        # next_allowed_round for hosts that 429'd — their budget is 0
        # until the cooldown passes (rows stay in the frontier)
        prev_state = (
            self._read(r - 1, "host_state")
            if r > 0 and os.path.isdir(os.path.join(self._rdir(r - 1), "host_state"))
            else self._empty_host_state()
        )
        if "at_delay_ms" not in prev_state.columns:
            # resume across the pre-autothrottle layout: hosts start at
            # the base delay (NULL -> base in the fold / budget floor)
            prev_state = prev_state.withColumn("at_delay_ms", F.lit(None).cast("double"))
        budgeted = FR.with_host_budget(
            frontier_all, robots, cfg.round_seconds,
            host_state=(
                prev_state if cfg.autothrottle else prev_state.drop("at_delay_ms")
            ),
            current_round=r,
        )
        selected = FR.topk_per_host(budgeted, salt_factor=cfg.salt_factor).drop("host_budget").cache()

        # fused fetch+parse: bodies never cross the JVM<->Python boundary
        fetched = fetch_parse(selected, cfg.num_hosts, cfg.max_attempts,
                              fetcher=cfg.fetcher).cache()

        # 1->N fan-out: the dataset doc (doc_id = url_hash) plus one doc
        # per embedded sample (doc_id = url_hash#role) — the SRA
        # study -> dataset + samples shape (ncbi_sra.py:381+)
        ok = fetched.filter(F.col("status") == 200)
        dataset_docs = ok.select(
            F.col("url_hash").alias("doc_id"), F.col("canonical_url"), F.col("spans")
        )
        sample_docs = ok.select(
            "url_hash", "canonical_url", F.explode("subdocs").alias("sd")
        ).select(
            F.concat(F.col("url_hash"), F.lit("#"), F.col("sd.role")).alias("doc_id"),
            F.col("canonical_url"),
            F.col("sd.spans").alias("spans"),
        )
        documents = dataset_docs.unionByName(sample_docs).withColumn("round", F.lit(r))

        outlinks = (
            fetched.select(F.explode("outlinks").alias("url"))
            .withColumn("priority", F.lit(cfg.discovered_priority))
        )

        frontier_next = frontier_all.join(
            selected.select("url_hash"), "url_hash", "left_anti"
        ).select(*FRONTIER_COLS)

        # host_state (FIXTURES F6): cumulative per-host politeness ledger —
        # fetch counts, bytes, and the Retry-After cooldown: a host whose
        # round ended with a (retry-exhausted) 429 is barred for
        # ceil(max_retry_after / round_seconds) rounds. READ back by
        # with_host_budget at the top of the next round — the feedback
        # loop the round-1 audit found missing.
        # signed latency history in crawl order (priority, seq, url_hash):
        # positive for 200s, negative marks a failed fetch (the fold may
        # only raise the delay on those) — the AutoThrottle input
        signed_lat = F.when(
            F.col("status") == 200, F.col("latency_ms").cast("double")
        ).otherwise(-F.col("latency_ms").cast("double"))
        spent = fetched.groupBy("host").agg(
            F.count("*").alias("fetched_round"),
            F.sum("bytes").alias("bytes_round"),
            F.max(
                F.when(F.col("status") == 429, F.col("retry_after_s")).otherwise(0)
            ).alias("ra_s"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("priority", "seq", "url_hash", signed_lat.alias("x")))
                ),
                lambda s: s.getField("x"),
            ).alias("lat_hist"),
        )
        new_nar = F.when(
            F.col("ra_s") > 0,
            F.lit(r) + F.ceil(F.col("ra_s") / F.lit(float(cfg.round_seconds))),
        ).otherwise(F.lit(None))
        # AutoThrottle fold: seed with the host's previous adapted delay
        # (base for new hosts), fold this round's signed latencies in
        # crawl order; hosts not fetched this round keep their delay.
        base_d = F.lit(float(cfg.at_base_delay_ms))
        max_d = F.lit(float(cfg.at_max_delay_ms))
        start_d = F.lit(float(
            cfg.at_start_delay_ms if cfg.at_start_delay_ms is not None
            else cfg.at_base_delay_ms
        ))
        prev_at = F.coalesce(F.col("at_delay_ms"), start_d)

        def _at_fold(acc, x):
            tgt = F.abs(x) / F.lit(float(cfg.at_concurrency))
            nd = F.least(F.greatest(tgt, (acc + tgt) / 2, base_d), max_d)
            return F.when(x >= 0, nd).otherwise(F.greatest(acc, nd))

        new_at = (
            F.when(F.col("lat_hist").isNull(), prev_at).otherwise(
                F.aggregate(F.col("lat_hist"), prev_at, _at_fold)
            )
            if cfg.autothrottle
            else prev_at
        )
        host_state = (
            prev_state.join(spent, "host", "full")
            .select(
                "host",
                (F.coalesce(F.col("fetched_total"), F.lit(0))
                 + F.coalesce(F.col("fetched_round"), F.lit(0))).alias("fetched_total"),
                (F.coalesce(F.col("bytes_total"), F.lit(0))
                 + F.coalesce(F.col("bytes_round"), F.lit(0))).alias("bytes_total"),
                F.greatest(
                    F.coalesce(F.col("next_allowed_round"), F.lit(0)),
                    F.coalesce(new_nar, F.lit(0)),
                ).cast("int").alias("next_allowed_round"),
                new_at.alias("at_delay_ms"),
            )
        )

        lineage = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id", "host_bucket")
            .agg(
                F.count("*").alias("urls_fetched"),
                F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
                F.sum("bytes").alias("bytes"),
                F.max("fetch_wall_ms").alias("wall_ms"),
                F.sum("attempts").alias("attempts"),
            )
            .withColumn("round", F.lit(r))
        )

        # round stats FIRST: the aggregation materializes the cached
        # fetch result (and its cached parents) exactly once, so the
        # parallel write jobs below all hit warm caches instead of racing
        # to fill them. Never a parquet re-read or a frontier
        # reconstruction (each would be an extra full Spark job; at
        # sandbox scale job latency dominates round wall time).
        # frontier_next = frontier_all minus selected, and both sides have
        # unique url_hash (dedupe_candidates + the seen invariant), so its
        # count is exact arithmetic on counts already in hand.
        fstats = fetched.agg(
            F.count("*").alias("sel"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("docs"),
            F.sum(F.size("outlinks")).alias("out"),
        ).first()
        n_unseen = unseen.count()
        n_frontier = frontier_all.count()

        # ---- commit: data first, marker last ----
        # The per-round state tables are INDEPENDENT outputs of already-
        # cached frames, so their write jobs run CONCURRENTLY (Spark's
        # scheduler interleaves jobs; each small job alone cannot fill
        # the executor). This collapses ~8 sequential job latencies into
        # ~max-of-them per round — round latency is the politeness-bound
        # crawl's rate limiter, at any cluster size. The marker still
        # goes last, only after every write returned.
        writes: list[tuple[DataFrame, str]] = [
            (
                fetched.select(
                    "url_hash", "canonical_url", "host", "priority", "seq", "status",
                    "attempts", "bytes",
                ).withColumn("round", F.lit(r)),
                "selected",
            ),
            (documents, "documents"),
            (new_seen, "new_seen"),
            (outlinks, "outlinks"),
            # host-bounded state tables: coalesce to a few files (a 10^6-
            # host table is still small; corpus-scale tables above keep
            # their natural partitioning)
            (robots.coalesce(8), "robots_cache"),
            (host_state.coalesce(8), "host_state"),
            (lineage.coalesce(8), "lineage"),
        ]
        if mode == "cuckoo":
            # incremental maintenance, cuckoo form: insert the round's
            # delta fingerprints into their own segments (cogroup); a
            # geometry change or load-factor breach (committed keys past
            # ~80% of table capacity — eviction walks degrade and spill
            # to the stash) rebuilds at 2x headroom like the bloom path.
            seen_total = self._seen_total + n_unseen
            sizing = (
                CK.cuckoo_segments_sizing(prev_segments)
                if prev_segments is not None else None
            )
            if sizing is not None:
                cap_total = int(sizing[1] * sizing[2] * sizing[0] / 1.25)
                if sizing[0] != cfg.bloom_segments or seen_total > 0.8 * cap_total:
                    prev_segments, sizing = None, None
            if prev_segments is not None and sizing is not None:
                new_segments = CK.insert_into_cuckoo_segments(
                    prev_segments, new_seen.select("url_hash"),
                    per_seg_capacity=max(int(sizing[1] * sizing[2] / 1.25), 64),
                    slots=sizing[2],
                )
            else:
                new_segments = CK.build_cuckoo_segments(
                    seen.select("url_hash").unionByName(new_seen.select("url_hash")),
                    nseg=cfg.bloom_segments,
                    capacity=max(cfg.bloom_expected, 2 * seen_total),
                )
            writes.append((new_segments.coalesce(8), "cuckoo_segments"))
        elif cfg.use_bloom:
            # incremental maintenance: this round's segment table =
            # previous table OR the delta's segments — committed with the
            # round, so a resumed run picks up exactly the filter state
            # matching its seen set. The table is REBUILT from the full
            # seen-through-r set instead of OR-ed when (a) no previous
            # table exists (round 0, resume across a layout change),
            # (b) the configured segment count changed (the persisted
            # nseg disagrees — OR-ing would mis-route keys), or (c) the
            # committed key count has outgrown the persisted bit-array
            # sizing (fpp would blow past budget). Rebuilds size for
            # 2x the current count, so growth triggers amortized-O(1)
            # doubling rebuilds, never a per-round resize.
            seen_total = self._seen_total + n_unseen
            need_nbits, _ = SN._seg_params(
                max(cfg.bloom_expected, seen_total), cfg.bloom_segments, cfg.bloom_fpp
            )
            sizing = SN.segments_sizing(prev_segments) if prev_segments is not None else None
            if sizing is not None and (
                sizing[0] != cfg.bloom_segments or sizing[1] < need_nbits
            ):
                prev_segments, sizing = None, None
            if prev_segments is not None and sizing is not None:
                # delta carries the persisted table's exact geometry
                delta_segments = SN.build_bloom_segments(
                    new_seen, nseg=sizing[0], fpp=cfg.bloom_fpp,
                    sizing=(sizing[1], sizing[2]),
                )
                new_segments = SN.or_bloom_segments(prev_segments, delta_segments)
            else:
                new_segments = SN.build_bloom_segments(
                    seen.select("url_hash").unionByName(new_seen.select("url_hash")),
                    nseg=cfg.bloom_segments,
                    expected=max(cfg.bloom_expected, 2 * seen_total),
                    fpp=cfg.bloom_fpp,
                )
            writes.append((new_segments.coalesce(8), "bloom_segments"))
        if cfg.frontier_deltas:
            # O(delta) persistence: what entered and what left the
            # frontier this round; periodic compaction bounds the
            # reconstruction chain
            writes.append((allowed.select(*FRONTIER_COLS), "frontier_add"))
            writes.append((selected.select("url_hash"), "frontier_remove"))
            if (r + 1) % cfg.compact_every == 0:
                writes.append((frontier_next, "frontier_compact"))
        else:
            writes.append((frontier_next, "frontier_next"))
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(writes))) as ex:
            futures = [ex.submit(self._write, df, r, name) for df, name in writes]
            for f in futures:
                f.result()  # propagate the first failure -> no marker

        meta = {
            "round": r,
            "selected": fstats["sel"],
            "documents": int(fstats["docs"] or 0),
            "new_seen": n_unseen,
            "frontier_next": n_frontier - fstats["sel"],
            "outlinks": int(fstats["out"] or 0),
            "wall_s": round(time.monotonic() - t0, 3),
        }
        if cfg.recrawl_ttl_rounds is not None:
            # cumulative guarded-delete rebuild count as of this commit
            meta["cuckoo_rebuilds_total"] = self.cuckoo_rebuilds.value
        self._commit(r, meta)
        self._seen_total += n_unseen
        for df in (robots, frontier_all, selected, fetched, unseen):
            df.unpersist()
        if ttl_deleted_segments is not None:
            ttl_deleted_segments.unpersist()
        return meta

    # ---------- state reconstruction (resume) ----------
    def _frontier_through(self, r: int) -> DataFrame:
        """Frontier state after round r. Snapshot mode reads the round's
        snapshot; delta mode reconstructs lazily from the latest
        compaction + subsequent add/remove deltas — no materialized
        rewrite of the full frontier ever happens."""
        if not self.cfg.frontier_deltas:
            return self._read(r, "frontier_next")
        base_round = None
        for i in range(r, -1, -1):
            if os.path.isdir(os.path.join(self._rdir(i), "frontier_compact")):
                base_round = i
                break
        base = (
            self._read(base_round, "frontier_compact")
            if base_round is not None
            else self._empty_frontier()
        )
        if base_round == r:
            return base
        lo = (base_round + 1) if base_round is not None else 0
        adds = self.spark.read.parquet(
            *[os.path.join(self._rdir(i), "frontier_add") for i in range(lo, r + 1)]
        )
        removes = self.spark.read.parquet(
            *[os.path.join(self._rdir(i), "frontier_remove") for i in range(lo, r + 1)]
        )
        return base.unionByName(adds).join(
            removes.select("url_hash").distinct(), "url_hash", "left_anti"
        )

    def _seen_through(self, r: int) -> DataFrame:
        paths = [os.path.join(self._rdir(i), "new_seen") for i in range(r + 1)]
        return self.spark.read.parquet(*paths)

    def _empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "url_hash string, first_seen_round int"
        )

    def _empty_frontier(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            "url_hash string, priority int, seq long, url string, canonical_url string,"
            " host string, host_bucket int, path string",
        )

    def _empty_robots(self) -> DataFrame:
        return self.spark.createDataFrame([], ROBOTS_SCHEMA)

    def _empty_host_state(self) -> DataFrame:
        return self.spark.createDataFrame(
            [],
            "host string, fetched_total long, bytes_total long, "
            "next_allowed_round int, at_delay_ms double",
        )

    # ---------- driver ----------
    def run(self, seeds: DataFrame | None = None, resume: bool = False) -> list[dict]:
        """Run (or resume) the crawl to cfg.max_rounds. ``seeds`` must have
        (url, priority); required unless resuming past round 0. Raises
        ``ConcurrentRunError`` if another live process holds the run."""
        self._acquire_lock()
        try:
            return self._run_locked(seeds, resume)
        finally:
            self._release_lock()

    def _run_locked(self, seeds: DataFrame | None, resume: bool) -> list[dict]:
        done = self.committed_rounds() if resume else []
        if not resume:
            # fresh run: clear any prior state
            for d in os.listdir(self.run_dir):
                if d.startswith("round="):
                    shutil.rmtree(os.path.join(self.run_dir, d))
        metas: list[dict] = []
        # cumulative committed seen-key count — drives adaptive bloom
        # sizing (a count from meta JSON, never a Spark count() job)
        self._seen_total = sum(self._meta(i)["new_seen"] for i in done)
        if done:
            last = done[-1]
            start = last + 1
            frontier = self._frontier_through(last)
            seen = self._seen_through(last)
            robots = self._read(last, "robots_cache")
            candidates = self._read(last, "outlinks")
        else:
            if seeds is None:
                raise ValueError("seeds required for a fresh run")
            start = 0
            frontier = self._empty_frontier()
            seen = self._empty_seen()
            robots = self._empty_robots()
            candidates = seeds.select("url", F.col("priority").cast("int"))

        for r in range(start, self.cfg.max_rounds):
            meta = self._run_round(r, candidates, frontier, seen, robots)
            metas.append(meta)
            if meta["frontier_next"] == 0 and meta["outlinks"] == 0:
                break
            frontier = self._frontier_through(r)
            seen = self._seen_through(r)
            robots = self._read(r, "robots_cache")
            candidates = self._read(r, "outlinks")
        return metas

    # ---------- result accessors ----------
    def crawl_order(self) -> DataFrame:
        """Fetched URLs in canonical crawl order (round, priority, seq,
        url_hash) — the north-rule ordering invariant."""
        rounds = self.committed_rounds()
        paths = [os.path.join(self._rdir(i), "selected") for i in rounds]
        return self.spark.read.parquet(*paths).orderBy("round", "priority", "seq", "url_hash")

    def documents(self) -> DataFrame:
        rounds = self.committed_rounds()
        paths = [os.path.join(self._rdir(i), "documents") for i in rounds]
        return self.spark.read.parquet(*paths)

    def seen(self) -> DataFrame:
        rounds = self.committed_rounds()
        return self._seen_through(rounds[-1]) if rounds else self._empty_seen()

    def lineage(self) -> DataFrame:
        rounds = self.committed_rounds()
        paths = [os.path.join(self._rdir(i), "lineage") for i in rounds]
        return self.spark.read.parquet(*paths)

    def host_state(self) -> DataFrame:
        """Cumulative per-host politeness ledger as of the last round."""
        rounds = self.committed_rounds()
        return self._read(rounds[-1], "host_state")
