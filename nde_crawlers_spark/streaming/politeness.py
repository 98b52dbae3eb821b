"""Stateful streaming politeness scheduler.

The batch crawl plan enforces politeness with per-round budgets
(operators/frontier.py). This module is the *streaming* form of the same
contract — the Scrapy scheduler + AUTOTHROTTLE state
(tycho_crawler/files/settings.py:2-6) as a Structured Streaming stateful
operator: candidate URLs stream in, are grouped by host, and an
``applyInPandasWithState`` function maintains each host's token bucket

    state = (tokens, last_refill_epoch_s, emitted_total)

emitting only the URLs the host's crawl delay allows now; the rest stay
queued upstream (re-enqueued by the caller). State lives in the
streaming checkpoint, so a restarted query resumes each host's bucket
where it left off — the streaming analog of the crawl plan's
``host_state(next_allowed_time, tokens)`` table (FIXTURES.md F6).

Deterministic by construction: refill is driven by an event-style
``asof_s`` column carried in the data (not wall-clock), so tests and
replays produce identical schedules.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url_hash", T.StringType()),
        T.StructField("decision", T.StringType()),   # fetch | defer
        T.StructField("tokens_left", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("last_refill_s", T.DoubleType()),
        T.StructField("emitted_total", T.LongType()),
    ]
)

BURST_TOKENS = 4.0  # max bucket size: short bursts allowed, average rate capped


def schedule_with_state(
    candidates: DataFrame,
    crawl_delay_ms: int = 500,
) -> DataFrame:
    """Token-bucket scheduling over a (streaming) candidates frame with
    columns (host, url_hash, priority, seq, asof_s).

    rate = 1000/crawl_delay_ms tokens/sec (the DOWNLOAD_DELAY analog);
    each emitted fetch costs one token. Rows within a batch are processed
    in frontier order (priority, seq, url_hash)."""
    rate = 1000.0 / crawl_delay_ms if crawl_delay_ms > 0 else float("inf")

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            tokens, last_refill, emitted = state.get
        else:
            tokens, last_refill, emitted = BURST_TOKENS, 0.0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["priority", "seq", "url_hash"])
        out = []
        for _, r in rows.iterrows():
            now = float(r["asof_s"])
            if now > last_refill:
                tokens = min(BURST_TOKENS, tokens + (now - last_refill) * rate)
                last_refill = now
            if tokens >= 1.0:
                tokens -= 1.0
                emitted += 1
                out.append((host, r["url_hash"], "fetch", tokens))
            else:
                out.append((host, r["url_hash"], "defer", tokens))
        state.update((tokens, last_refill, emitted))
        yield pd.DataFrame(out, columns=["host", "url_hash", "decision", "tokens_left"])

    return candidates.groupBy("host").applyInPandasWithState(
        _fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
