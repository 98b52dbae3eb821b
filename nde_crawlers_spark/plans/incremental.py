"""Incremental batch harvest with window checkpoints and cache TTL.

Re-expresses the reference's resumable OAI-style harvest
(figshare_oai-pmh/files/sql_database.py):

- harvest in ``[from, until)`` windows, committing the checkpoint only
  after a window completes (``insert_last_updated(until)``,
  sql_database.py:465-467) so a killed run resumes at the last window;
- a cache TTL (``EXPIRE = 30/90/365 days``, sql_database.py:75) that
  forces a full re-harvest when the state is too old;
- the monotone-release guard: a source watermark older than the
  checkpoint is rejected (hub/dataload/nde.py:68-69).

Spark-first: the "remote repository" is any timestamped table; each
window is one predicate-pushdown scan (``ts >= from AND ts < until``)
appended to the target, then the checkpoint file is atomically renamed.
Window size is the unit of retry — the adaptive interval-halving of
sql_database.py:428-464 maps to re-running a failed window with a
narrower predicate, which is just a smaller checkpoint step here.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalHarvest:
    def __init__(self, spark: SparkSession, state_dir: str, expire_days: int = 90):
        self.spark = spark
        self.state_dir = state_dir
        self.expire = timedelta(days=expire_days)
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _ckpt_path(self) -> str:
        return os.path.join(self.state_dir, "checkpoint.json")

    def checkpoint(self) -> dict | None:
        if not os.path.exists(self._ckpt_path):
            return None
        with open(self._ckpt_path) as f:
            return json.load(f)

    def _commit_checkpoint(self, until: datetime, run_started: datetime) -> None:
        tmp = self._ckpt_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"last_updated": until.isoformat(), "committed_at": run_started.isoformat()},
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._ckpt_path)

    def plan_windows(
        self, lo: datetime, hi: datetime, step: timedelta, now: datetime
    ) -> tuple[datetime, list[tuple[datetime, datetime]]]:
        """Resume point + the [from, until) windows still to harvest.
        An expired cache (checkpoint older than EXPIRE) restarts from lo
        — the NO_CACHE / new_cache() path."""
        ck = self.checkpoint()
        start = lo
        if ck is not None:
            committed = datetime.fromisoformat(ck["committed_at"])
            if now - committed <= self.expire:
                start = max(lo, datetime.fromisoformat(ck["last_updated"]))
            # else: TTL expired -> full re-harvest from lo
        if ck is not None and datetime.fromisoformat(ck["last_updated"]) > hi:
            raise RuntimeError(
                "source watermark older than checkpoint — refusing stale harvest "
                "(monotone-release guard, nde.py:68-69 analog)"
            )
        windows = []
        cur = start
        while cur < hi:
            nxt = min(cur + step, hi)
            windows.append((cur, nxt))
            cur = nxt
        return start, windows

    def harvest(
        self,
        source: DataFrame,
        ts_col: str,
        lo: datetime,
        hi: datetime,
        step: timedelta,
        now: datetime | None = None,
        fail_at_window: int | None = None,
    ) -> list[dict]:
        """Harvest source rows into ``state_dir/data`` window by window,
        checkpoint after each. ``fail_at_window`` injects a crash for the
        resume tests."""
        now = now or datetime.utcnow()
        _, windows = self.plan_windows(lo, hi, step, now)
        metas = []
        for i, (w_from, w_until) in enumerate(windows):
            if fail_at_window is not None and i == fail_at_window:
                raise RuntimeError(f"injected failure before window {i}")
            # one overwritten directory per window: re-running a window
            # whose write landed but whose checkpoint didn't is idempotent
            # (the SQLite upsert-on-_id analog, sql_database.py:229-235)
            self._harvest_window(source, ts_col, w_from, w_until, now)
            metas.append({"window": i, "from": w_from.isoformat(), "until": w_until.isoformat()})
        return metas

    def harvest_adaptive(
        self,
        source: DataFrame,
        ts_col: str,
        lo: datetime,
        hi: datetime,
        step: timedelta,
        now: datetime | None = None,
        min_step: timedelta = timedelta(days=1),
        failing: "set[str] | None" = None,
    ) -> list[dict]:
        """Window harvest with adaptive halving: a failed window is split
        in two and retried, down to ``min_step`` — the interval-halving
        retry of sql_database.py:428-464 and the recursive esummary batch
        split of biosample/files/biosample.py:117-130. ``failing`` is a
        test hook: window-start isoformats that fail at full size."""
        now = now or datetime.utcnow()
        _, windows = self.plan_windows(lo, hi, step, now)
        out: list[dict] = []
        stack = list(reversed(windows))
        while stack:
            w_from, w_until = stack.pop()
            width = w_until - w_from
            injected = failing is not None and w_from.isoformat() in failing and width >= step
            try:
                if injected:
                    raise RuntimeError("injected window failure")
                self._harvest_window(source, ts_col, w_from, w_until, now)
                out.append({"from": w_from.isoformat(), "until": w_until.isoformat(),
                            "width_s": width.total_seconds()})
            except RuntimeError:
                if width <= min_step:
                    raise
                mid = w_from + width / 2
                stack.extend([(mid, w_until), (w_from, mid)][::-1])
        return out

    def _harvest_window(self, source, ts_col, w_from, w_until, now) -> None:
        rows = source.filter(
            (F.col(ts_col) >= F.lit(w_from)) & (F.col(ts_col) < F.lit(w_until))
        )
        wdir = os.path.join(
            self.state_dir, "data", f"window={w_from.strftime('%Y%m%dT%H%M%S')}"
        )
        rows.write.mode("overwrite").parquet(wdir)
        self._commit_checkpoint(w_until, now)

    def harvested(self) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(self.state_dir, "data")
        )

    # ---------------- OAI resumptionToken chains (S5) ----------------
    # The reference walks each source's token chain strictly sequentially
    # (figshare_oai-pmh/files/oai_helper.py:36-185: each response's
    # resumptionToken feeds the next request). The Spark-first shape is
    # BSP over chains: every live source advances exactly ONE page per
    # round inside an Arrow batch stage — sequential within a source
    # (the token data dependency), parallel across sources. Per-round
    # token state commits atomically, so a killed walk resumes mid-chain
    # with no duplicate records (page dirs are overwrite-idempotent).

    def _oai_dir(self, *parts: str) -> str:
        return os.path.join(self.state_dir, "oai", *parts)

    def _oai_tokens_path(self, rnd: int) -> str:
        return self._oai_dir(f"tokens_{rnd:04d}.json")

    def _oai_committed_round(self) -> int:
        rnd = -1
        base = self._oai_dir()
        if os.path.isdir(base):
            for f in os.listdir(base):
                if f.startswith("tokens_") and f.endswith(".json"):
                    rnd = max(rnd, int(f[7:11]))
        return rnd

    def harvest_token_chains(
        self,
        sources: list[tuple[str, int]],
        page_size: int = 25,
        resume: bool = False,
        fail_at_round: int | None = None,
        max_rounds: int = 10_000,
    ) -> int:
        """Walk every source's resumptionToken chain to exhaustion.
        ``sources`` = [(source_id, total_records)]. Returns rounds run.
        ``fail_at_round`` injects a crash for the resume test."""
        import pandas as pd

        from ..sources.synthetic import oai_list_records

        totals = dict(sources)
        start = 0
        if resume:
            last = self._oai_committed_round()
            if last >= 0:
                with open(self._oai_tokens_path(last)) as f:
                    chains = json.load(f)
                start = last + 1
            else:
                chains = {s: None for s, _ in sources}
        else:
            chains = {s: None for s, _ in sources}

        schema = "source_id string, rec_seq int, payload string, next_token string"

        def _fetch(batches):
            for pdf in batches:
                rows = []
                for sid, tok in zip(pdf["source_id"], pdf["token"]):
                    recs, nxt = oai_list_records(sid, tok if tok else None, totals[sid], page_size)
                    for s, i, p in recs:
                        rows.append((s, i, p, nxt or ""))
                    if not recs:
                        rows.append((sid, -1, "", nxt or ""))
                yield pd.DataFrame(rows, columns=["source_id", "rec_seq", "payload", "next_token"])

        rnd = start
        # live = sources whose chain has not terminated (token None means
        # fresh start only on round 0 of that source)
        live = {s: t for s, t in chains.items() if rnd == 0 or t}
        while live and rnd < max_rounds:
            if fail_at_round is not None and rnd == fail_at_round:
                raise RuntimeError(f"injected failure before OAI round {rnd}")
            frontier = self.spark.createDataFrame(
                sorted((s, t or "") for s, t in live.items()), "source_id string, token string"
            )
            page = frontier.mapInPandas(_fetch, schema=schema)
            out = page.filter(F.col("rec_seq") >= 0).withColumn("round", F.lit(rnd))
            out.write.mode("overwrite").parquet(self._oai_dir("data", f"round={rnd:04d}"))
            nxt_rows = (
                page.select("source_id", "next_token").distinct().collect()
            )
            live = {
                r["source_id"]: r["next_token"] for r in nxt_rows if r["next_token"]
            }
            tmp = self._oai_tokens_path(rnd) + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(live, f)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, self._oai_tokens_path(rnd))
            rnd += 1
        return rnd - start

    def oai_records(self) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true").parquet(
            self._oai_dir("data")
        )
