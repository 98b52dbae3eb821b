"""Streaming incremental near-dup detection: continuous document ingest
through the persisted-signature MinHash store.

The batch operator (operators/dedup.py::incremental_minhash_pairs) is
the per-delta kernel; this is its always-on form, mirroring how the
reference's sources trickle in new records per cron cycle rather than
re-dumping the corpus (docker-entrypoint cron loops, README.md:10-27):

    document stream (file source; production: Kafka/Iceberg CDC)
      -> foreachBatch: banded signatures for the delta only
         -> candidate pairs vs (persisted store + this delta)
         -> append delta signatures to the store, emit pairs

Exactly-once per micro-batch follows the crawl stream's discipline
(streaming/crawl_stream.py): per-batch output dirs are idempotently
overwritten, and each batch computes against the signature store of
strictly EARLIER batches only, so a replayed batch (crash between the
store write and the checkpoint commit) reproduces its pair set instead
of matching against its own partial signatures.

Scale shape: per micro-batch cost is O(|delta| + matching buckets) —
the corpus's signatures are never recomputed; with the store bucketed
by (band, bucket) (Iceberg bucket transform in production) the
candidate join is co-partitioned and the append is a plain insert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD

DOC_SCHEMA = "doc_id long, text string"
_STORE_SCHEMA = "id long, band int, bucket string"


class StreamingDedup:
    """File-source streaming dedup rooted at ``root`` with directories:
    incoming/ (input), store/ (banded signatures, one delta per batch),
    pairs/ (per-batch candidate pairs), checkpoint/."""

    def __init__(self, spark: SparkSession, root: str,
                 shingle_n: int = 3, bands: int = 4, rows_per_band: int = 2):
        self.spark = spark
        self.root = root
        self.shingle_n = shingle_n
        self.bands = bands
        self.rows_per_band = rows_per_band
        for d in ("incoming", "store", "pairs"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def store(self, before_batch: int | None = None) -> DataFrame:
        """The persisted signature store: union of committed per-batch
        deltas, optionally restricted to batches strictly before
        ``before_batch`` (the replay guard — a re-run of batch N must
        not see N's own partial signature write)."""
        base = self._dir("store")
        parts = []
        for d in sorted(os.listdir(base)):
            if not d.startswith("batch="):
                continue
            b = int(d.split("=")[1])
            if before_batch is None or b < before_batch:
                parts.append(os.path.join(base, d))
        if not parts:
            return self.spark.createDataFrame([], _STORE_SCHEMA)
        return self.spark.read.parquet(*parts)

    def pairs(self) -> DataFrame:
        return self.spark.read.parquet(self._dir("pairs") + "/*")

    def run_available_now(self) -> None:
        """Drain currently-available documents, then stop. Re-runnable:
        the streaming checkpoint skips already-processed input files."""
        stream = self.spark.readStream.schema(DOC_SCHEMA).parquet(self._dir("incoming"))
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self._dir("checkpoint"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _process_batch(self, docs: DataFrame, batch_id: int) -> None:
        pairs, new_banded = DD.incremental_minhash_pairs(
            docs, self.store(before_batch=batch_id),
            shingle_n=self.shingle_n, bands=self.bands,
            rows_per_band=self.rows_per_band,
        )
        pairs.withColumn("batch", F.lit(batch_id)).write.mode("overwrite").parquet(
            self._dir(f"pairs/batch={batch_id:06d}")
        )
        new_banded.write.mode("overwrite").parquet(
            self._dir(f"store/batch={batch_id:06d}")
        )
