"""Streaming crawl pipeline: the crawl loop as a Structured Streaming job.

The batch plan (plans/crawl.py) is the BSP/round architecture; this is
the always-on form for continuous discovery, mirroring how the reference
crawlers run perpetually under cron (docker-entrypoint cron loops,
README.md:10-27) rather than as one-shot jobs:

    candidate URL stream (file source; production: Kafka/Iceberg CDC)
      -> canonicalize (same kernel)
      -> stateful politeness scheduler (streaming/politeness.py,
         applyInPandasWithState token buckets per host)
      -> foreachBatch: seen-filter against the persistent seen table,
         fused fetch+parse, append documents + seen delta, re-emit
         deferred URLs

foreachBatch is the documented pattern for per-batch work against
mutable external state (the seen table) and multi-sink writes. The
scheduler's output carries every candidate column (url, canonical_url,
priority, seq, asof_s), so the batch processor touches ONLY its own
micro-batch's rows — no per-batch re-scan of the candidates directory,
which would be O(total-history) work in an always-on job. Exactly-once
per micro-batch comes from (a) idempotent overwrite of per-batch output
dirs and (b) computing each batch's unseen set against strictly EARLIER
seen batches, so a replayed batch (crash between the seen write and the
checkpoint commit) reproduces its output instead of seeing its own
partial writes as already-seen. Deferred URLs (over politeness budget)
are written back out so a later micro-batch retries them — the
streaming analog of leaving them in the frontier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import urls as U
from ..operators import seen as SN
from ..operators.fetch import fetch_parse
from .politeness import schedule_with_state

CAND_SCHEMA = "url string, priority int, asof_s double"


class StreamingCrawl:
    """File-source streaming crawl rooted at ``root`` with directories:
    candidates/ (input), documents/, seen/, deferred/, checkpoint/."""

    def __init__(self, spark: SparkSession, root: str, num_hosts: int,
                 crawl_delay_ms: int = 500):
        self.spark = spark
        self.root = root
        self.num_hosts = num_hosts
        self.crawl_delay_ms = crawl_delay_ms
        for d in ("candidates", "documents", "seen", "deferred"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def seen(self, before_batch: int | None = None) -> DataFrame:
        """The persistent seen table. ``before_batch`` excludes that batch
        id and later — the REPLAY guard: a re-run of micro-batch N (crash
        after the seen write, before the checkpoint commit) must compute
        its unseen set against only batches < N, or it would see its own
        partial output and permanently drop the batch's documents."""
        base = self._dir("seen")
        dirs = sorted(d for d in os.listdir(base) if d.startswith("batch="))
        if before_batch is not None:
            dirs = [d for d in dirs if int(d.split("=")[1]) < before_batch]
        if not dirs:
            return self.spark.createDataFrame([], "url_hash string")
        return self.spark.read.parquet(*[os.path.join(base, d) for d in dirs])

    def documents(self) -> DataFrame:
        return self.spark.read.parquet(self._dir("documents") + "/*")

    def deferred(self) -> DataFrame:
        return self.spark.read.parquet(self._dir("deferred") + "/*")

    def run_available_now(self) -> None:
        """Drain currently-available candidates through the stateful
        scheduler into the batch processor, then stop. Re-runnable: the
        streaming checkpoint skips already-processed candidate files and
        the politeness state resumes where it left off."""
        stream = self.spark.readStream.schema(CAND_SCHEMA).parquet(self._dir("candidates"))
        keyed = (
            U.with_url_columns(stream)
            .withColumn("seq", U.hash_seq(F.col("canonical_url")))
            .select("host", "url_hash", "priority", "seq", "asof_s",
                    "url", "canonical_url", "host_bucket")
        )
        scheduled = schedule_with_state(keyed, crawl_delay_ms=self.crawl_delay_ms)
        q = (
            scheduled.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self._dir("checkpoint"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _process_batch(self, decisions: DataFrame, batch_id: int) -> None:
        """Per micro-batch: seen-filter the fetchables, fused fetch+parse,
        write the three outputs (idempotent overwrite per batch id).

        Works ONLY on the scheduler's own rows — the scheduler passes
        url/canonical_url/priority/seq through its output schema, so
        there is no O(total-history) re-scan of candidates/ and no join
        per batch. Replay-safe: the unseen set is computed against seen
        batches strictly BEFORE this one, so a re-run of a crashed batch
        recomputes the identical unseen set and overwrites its own
        partial output instead of seeing it as already-seen."""
        fetchable = decisions.filter(F.col("decision") == "fetch")
        unseen = SN.filter_unseen_exact(
            fetchable, self.seen(before_batch=batch_id)
        ).cache()
        fetched = fetch_parse(unseen, self.num_hosts, colocate=True)
        ok = fetched.filter(F.col("status") == 200)
        docs = ok.select(
            F.col("url_hash").alias("doc_id"), "canonical_url", "spans"
        ).unionByName(
            ok.select("url_hash", "canonical_url", F.explode("subdocs").alias("sd")).select(
                F.concat(F.col("url_hash"), F.lit("#"), F.col("sd.role")).alias("doc_id"),
                F.col("canonical_url"),
                F.col("sd.spans").alias("spans"),
            )
        )
        docs.write.mode("overwrite").parquet(self._dir(f"documents/batch={batch_id:06d}"))
        unseen.select("url_hash").write.mode("overwrite").parquet(
            self._dir(f"seen/batch={batch_id:06d}")
        )
        decisions.filter(F.col("decision") == "defer").select(
            "url", "priority", (F.col("asof_s") + F.lit(1.0)).alias("asof_s")
        ).write.mode("overwrite").parquet(self._dir(f"deferred/batch={batch_id:06d}"))
        unseen.unpersist()
