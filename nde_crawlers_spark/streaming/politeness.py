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

# Version of the per-host state row layout. Spark's state store REJECTS
# a resumed query whose state schema differs from the checkpoint's
# (at_delay_ms was added in v2 — a v1 checkpoint fails the
# compatibility check at query START, before any state is read), so
# schema changes must bump this version and consumers key their
# checkpoint DIRECTORY on it (streaming/crawl_stream.py uses
# checkpoint/v{STATE_VERSION}): an old checkpoint is retired cleanly —
# the stream reprocesses from scratch with idempotent per-batch-id
# writes (identical outputs; only pacing state is lost) — instead of
# dying on the opaque state-store error.
STATE_VERSION = 2
STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("last_refill_s", T.DoubleType()),
        T.StructField("emitted_total", T.LongType()),
        # AutoThrottle-adapted per-host delay (ms); refill rate derives
        # from greatest(crawl_delay, at_delay) once feedback arrives.
        # NULL until the host's first feedback row (same-version states
        # read back with st[3] is None — guarded at the fold site).
        T.StructField("at_delay_ms", T.DoubleType()),
    ]
)

BURST_TOKENS = 4.0  # max bucket size: short bursts allowed, average rate capped


def bucket_schedule(
    times, tokens: float, last_refill: float, emitted: int, rate: float
) -> tuple[list[bool], list[float], float, float, int]:
    """Token-bucket decisions, closed-form per REFILL-RUN instead of per
    row. A refill fires at row i iff its event time exceeds the running
    max of earlier times (the bucket's last_refill); between refills the
    bucket only drains by unit spends, so within a run the first
    floor(tokens) rows fetch — a cumcount comparison. The Python loop
    iterates over RUNS (distinct increasing timestamps; crawl candidate
    batches carry many URLs per scheduling instant), with a scalar step
    for length-1 runs so the worst case (all-distinct times) costs what
    the old per-row loop cost.

    Float discipline: refill adds, unit spends, and integer subtraction
    are exact IEEE754 here, so this is BIT-IDENTICAL to the per-row loop
    it replaces (tests/test_streaming_politeness.py asserts exact
    equality over randomized trials incl. out-of-order times, burst
    clamping, and the infinite-rate path).

    Micro-bench (10^5-row batch): 100 distinct times -> 2.6 ms vs the
    per-row loop's 9.2 ms (3.6x); 10^3 distinct -> parity; all-distinct
    worst case matches the per-row loop via the scalar step.

    -> (decisions, tokens_left, tokens, last_refill, emitted)."""
    import numpy as np

    t = np.asarray(times, dtype=float)
    n = len(t)
    decisions: list[bool] = [False] * n
    toks: list[float] = [0.0] * n
    if n:
        rm = np.maximum.accumulate(np.concatenate(([last_refill], t)))[:-1]
        if np.isfinite(rate):
            add = np.clip(t - rm, 0.0, None) * rate
        else:  # crawl_delay_ms <= 0: any forward tick refills to full
            add = np.where(t > rm, np.inf, 0.0)
        starts = np.flatnonzero(add > 0)
        edges = np.unique(np.concatenate(([0], starts, [n]))).tolist()
        add_l = add.tolist()  # Python floats: run-loop state stays scalar
        for a, b in zip(edges[:-1], edges[1:]):
            ad = add_l[a]
            if ad > 0:
                tokens = min(BURST_TOKENS, tokens + ad)
            if b - a == 1:  # length-1 run: identical cost to a row step
                if tokens >= 1.0:
                    tokens -= 1.0
                    emitted += 1
                    decisions[a] = True
                toks[a] = tokens
                continue
            m = min(b - a, int(tokens) if tokens >= 1.0 else 0)
            decisions[a:a + m] = [True] * m
            toks[a:b] = (tokens - np.minimum(np.arange(1, b - a + 1), m)).tolist()
            tokens -= m
            emitted += m
        tmax = float(t.max())
        if tmax > last_refill:
            last_refill = tmax
    return decisions, toks, float(tokens), float(last_refill), int(emitted)


def at_fold(xs: list[float], acc: float, base: float, maxd: float, conc: float) -> float:
    """The Scrapy AutoThrottle recurrence over signed latencies (the
    same fold the batch plan runs in plans/crawl.py host_state):
    target = |latency|/C; next = clamp(max(target, (delay + target)/2),
    base, max) — including Scrapy's max(target, mean) step, so one very
    slow response raises the delay to its full target. A negative value
    marks a failed fetch, which may only RAISE the delay."""
    for x in xs:
        tgt = abs(x) / conc
        nd = min(max(tgt, (acc + tgt) / 2, base), maxd)
        acc = nd if x >= 0 else max(acc, nd)
    return acc


def schedule_with_state(
    candidates: DataFrame,
    crawl_delay_ms: int = 500,
    at_base_delay_ms: float = 500.0,
    at_max_delay_ms: float = 60_000.0,
    at_concurrency: float = 1.0,
    at_start_delay_ms: float | None = 5000.0,
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
    in frontier order (priority, seq, url_hash).

    AUTOTHROTTLE (streaming form of plans/crawl.py's live fold): when
    the input carries a non-null ``latency_ms`` column, those rows are
    FEEDBACK — fetch outcomes the batch processor re-emitted into the
    candidate stream (negative latency marks a failure). Feedback rows
    update the host's adapted delay (at_fold) and are consumed (not
    re-emitted); the batch's candidate rows are then scheduled at
    rate = 1000 / greatest(crawl_delay_ms, at_delay) — the adapted
    delay can only raise the politeness floor, exactly like the batch
    scheduler. Feedback is applied at batch START, so a replayed batch
    reschedules identically (state + batch composition are both
    checkpointed)."""
    rate0 = 1000.0 / crawl_delay_ms if crawl_delay_ms > 0 else float("inf")
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
            st = state.get
            tokens, last_refill, emitted = st[0], st[1], st[2]
            at_delay = st[3] if len(st) > 3 and st[3] is not None else 0.0
        else:
            tokens, last_refill, emitted, at_delay = BURST_TOKENS, 0.0, 0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if "latency_ms" in rows.columns:
            fb = rows[rows["latency_ms"].notna()]
            rows = rows[rows["latency_ms"].isna()]
            if len(fb):
                xs = fb.sort_values(["asof_s", "url_hash"])["latency_ms"].astype(float)
                start = (
                    at_start_delay_ms if at_start_delay_ms is not None
                    else at_base_delay_ms
                )
                at_delay = at_fold(
                    xs.tolist(), at_delay if at_delay > 0 else start,
                    at_base_delay_ms, at_max_delay_ms, at_concurrency,
                )
        eff_delay = max(float(crawl_delay_ms), at_delay)
        rate = (1000.0 / eff_delay) if eff_delay > 0 else rate0
        rows = rows.sort_values(["priority", "seq", "url_hash"]).drop_duplicates(
            subset=["url_hash"], keep="first"
        )
        decisions, toks, tokens, last_refill, emitted = bucket_schedule(
            rows["asof_s"].to_numpy(dtype=float), tokens, last_refill, emitted, rate
        )
        out = rows.copy()
        out["decision"] = ["fetch" if d else "defer" for d in decisions]
        out["tokens_left"] = toks
        state.update((tokens, last_refill, emitted, at_delay))
        yield out[in_cols + ["decision", "tokens_left"]]

    return candidates.groupBy("host").applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
