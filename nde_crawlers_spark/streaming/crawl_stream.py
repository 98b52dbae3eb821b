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

foreachBatch is the documented pattern for per-batch joins against
mutable external state (the seen table) and multi-sink writes; the
streaming checkpoint gives exactly-once per micro-batch — the same
guarantee the batch plan's round _COMMIT markers give. Deferred URLs
(over politeness budget) are written back out so a later micro-batch
retries them — the streaming analog of leaving them in the frontier.
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

    def seen(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self._dir("seen") + "/*")
        except Exception:  # noqa: BLE001 — no batches committed yet
            return self.spark.createDataFrame([], "url_hash string")

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
        """Per micro-batch: join decisions back to full candidate rows,
        seen-filter the fetchables, fused fetch+parse, write the three
        outputs (idempotent overwrite per batch id)."""
        spark = decisions.sparkSession
        cands = spark.read.schema(CAND_SCHEMA).parquet(self._dir("candidates"))
        enriched = U.with_url_columns(cands).withColumn(
            "seq", U.hash_seq(F.col("canonical_url"))
        )
        joined = enriched.join(
            decisions.select("url_hash", "decision").distinct(), "url_hash", "inner"
        )
        fetchable = joined.filter(F.col("decision") == "fetch")
        unseen = SN.filter_unseen_exact(fetchable, self.seen()).cache()
        fetched = fetch_parse(unseen, self.num_hosts, colocate=True)
        docs = fetched.filter(F.col("status") == 200).select(
            F.col("url_hash").alias("doc_id"), "canonical_url", "spans"
        )
        docs.write.mode("overwrite").parquet(self._dir(f"documents/batch={batch_id:06d}"))
        unseen.select("url_hash").write.mode("overwrite").parquet(
            self._dir(f"seen/batch={batch_id:06d}")
        )
        joined.filter(F.col("decision") == "defer").select(
            "url", "priority", (F.col("asof_s") + F.lit(1.0)).alias("asof_s")
        ).write.mode("overwrite").parquet(self._dir(f"deferred/batch={batch_id:06d}"))
        unseen.unpersist()
