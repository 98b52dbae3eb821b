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
    """Token-bucket scheduling over a (streaming) candidates frame that
    has at least (host, url_hash, priority, seq, asof_s).

    ALL input columns pass through to the output (+ decision,
    tokens_left): downstream batch processors work entirely on the
    scheduler's own rows — no join back to a re-scan of the candidates
    directory, which at scale would be O(total-history) work per
    micro-batch. Duplicate url_hash rows within a micro-batch collapse to
    the best (priority, seq) one, deterministically.

    rate = 1000/crawl_delay_ms tokens/sec (the DOWNLOAD_DELAY analog);
    each emitted fetch costs one token. Rows within a batch are processed
    in frontier order (priority, seq, url_hash)."""
    rate = 1000.0 / crawl_delay_ms if crawl_delay_ms > 0 else float("inf")
    in_cols = [f.name for f in candidates.schema.fields]
    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [
            T.StructField("decision", T.StringType()),     # fetch | defer
            T.StructField("tokens_left", T.DoubleType()),
        ]
    )

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        del key  # host is already a pass-through column
        if state.exists:
            tokens, last_refill, emitted = state.get
        else:
            tokens, last_refill, emitted = BURST_TOKENS, 0.0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["priority", "seq", "url_hash"]).drop_duplicates(
            subset=["url_hash"], keep="first"
        )
        # single vectorized pass over the asof array: the token feedback is
        # sequential by nature (each fetch spends the token the next row
        # sees), but the per-row work is a couple of float ops — no pandas
        # row objects in the loop
        decisions: list[str] = []
        toks: list[float] = []
        for now in rows["asof_s"].to_numpy(dtype=float):
            if now > last_refill:
                tokens = min(BURST_TOKENS, tokens + (now - last_refill) * rate)
                last_refill = now
            if tokens >= 1.0:
                tokens -= 1.0
                emitted += 1
                decisions.append("fetch")
            else:
                decisions.append("defer")
            toks.append(tokens)
        out = rows.copy()
        out["decision"] = decisions
        out["tokens_left"] = toks
        state.update((tokens, last_refill, emitted))
        yield out[in_cols + ["decision", "tokens_left"]]

    return candidates.groupBy("host").applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
