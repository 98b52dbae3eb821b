"""Real-socket HTTP fetcher behind the injectable fetch contract.

The reference fetches with Twisted-async Scrapy downloaders or
requests-with-retry helpers (utils/utils.py:69-100 retry decorator;
every crawler's settings.py ships RETRY_TIMES-style bounded retries and
a Retry-After-aware backoff). ``HttpFetcher`` is the stdlib-urllib
equivalent shaped to the exact record contract ``fetch.fetch_parse``
consumes, so swapping the deterministic synthetic corpus for real
sockets changes NOTHING in the Spark plan:

    fetch_parse(selected, num_hosts, fetcher=HttpFetcher())

Contract (same keys as sources/synthetic.py::synth_fetch):
    status        final HTTP status (0 = transport error after retries)
    attempts      attempts consumed (bounded by max_attempts)
    kind          parse dialect — X-NDE-Kind header if present, else
                  mapped from Content-Type (html/xml/json/soft)
    body          decoded text body ('' on failure)
    bytes         wire body size in bytes
    retry_after_s Retry-After seconds from the FINAL attempt (0 unless
                  it ended 429/503 with the header)
    latency_ms    measured wall-clock download latency of the final
                  attempt — the AutoThrottle adaptation input; with the
                  synthetic corpus this is corpus data, here it is real

Retry policy mirrors the synthetic one (and the reference's
``utils/utils.py`` retry decorator): transient statuses (429, 5xx) and
transport errors retry up to ``max_attempts`` total tries; other
statuses are final on the first response. No sleep between attempts —
pacing is the SCHEDULER's job (host budgets / politeness delays), not
the fetcher's, exactly as in Scrapy where the downloader slot, not the
download handler, enforces delays.

The instance is pickled into Spark Python workers (plain attrs only);
each worker opens its own sockets. Tested against a loopback
ThreadingHTTPServer serving the synthetic corpus + robots.txt
(tests/test_http_fetch.py), including a full 2-round ``CrawlRun``.
"""

from __future__ import annotations

import datetime
import email.utils
import time
import urllib.error
import urllib.request

_TRANSIENT = {429, 500, 502, 503, 504}

_CT_KINDS = (
    ("text/html", "html"),
    ("application/json", "json"),
    ("application/xml", "xml"),
    ("text/xml", "xml"),
    ("text/plain", "soft"),
)


def _kind_of(headers) -> str:
    k = headers.get("X-NDE-Kind") if headers is not None else None
    if k:
        return k
    ct = (headers.get("Content-Type") or "").lower() if headers is not None else ""
    for prefix, kind in _CT_KINDS:
        if ct.startswith(prefix):
            return kind
    return "html"


def _retry_after_s(headers) -> int:
    """Retry-After in seconds: RFC 9110 allows both delta-seconds and an
    HTTP-date; real servers emit both forms, so parse both."""
    raw = headers.get("Retry-After", "0") if headers is not None else "0"
    try:
        return max(0, int(raw))
    except (TypeError, ValueError):
        pass
    try:
        when = email.utils.parsedate_to_datetime(raw)
        if when.tzinfo is None:
            when = when.replace(tzinfo=datetime.timezone.utc)
        now = datetime.datetime.now(datetime.timezone.utc)
        return max(0, int((when - now).total_seconds()))
    except (TypeError, ValueError):
        return 0


class HttpFetcher:
    """Picklable ``(canonical_url) -> record`` callable over urllib."""

    def __init__(self, max_attempts: int = 3, timeout_s: float = 10.0,
                 user_agent: str = "nde-crawlers-spark/0.1", scheme: str = "https"):
        self.max_attempts = max_attempts
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.scheme = scheme

    def _once(self, url: str):
        """One attempt -> (status, headers, body_bytes)."""
        req = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, resp.headers, resp.read()
        except urllib.error.HTTPError as e:
            # error responses: headers carry Retry-After; body irrelevant
            return e.code, e.headers, b""
        except (urllib.error.URLError, OSError, TimeoutError):
            # transport failure (refused, reset, DNS, timeout)
            return 0, None, b""

    def _retrying(self, url: str):
        """Bounded-retry fetch -> (status, headers, raw, attempts, latency_ms).
        Transient statuses (429/5xx) and transport errors (status 0) retry
        up to max_attempts; latency is the FINAL attempt's wall clock."""
        for attempts in range(1, self.max_attempts + 1):
            t0 = time.monotonic()
            status, headers, raw = self._once(url)
            if status == 200 or (status not in _TRANSIENT and status != 0):
                break
        latency_ms = int((time.monotonic() - t0) * 1000)
        return status, headers, raw, attempts, latency_ms

    def __call__(self, url: str) -> dict:
        status, headers, raw, attempts, latency_ms = self._retrying(url)
        if status != 200:
            return {
                "status": status, "attempts": attempts, "kind": "", "body": "",
                "bytes": 0,
                "retry_after_s": _retry_after_s(headers) if status in (429, 503) else 0,
                "latency_ms": latency_ms,
            }
        body = raw.decode("utf-8", "replace")
        return {
            "status": 200, "attempts": attempts, "kind": _kind_of(headers),
            "body": body, "bytes": len(raw), "retry_after_s": 0,
            "latency_ms": latency_ms,
        }

    def robots_txt(self, host: str) -> str:
        """Fetch a host's /robots.txt (missing file -> '' = allow-all).
        The crawl plan's robots contract (plans/crawl.py::_update_robots).
        Routed through the same bounded-retry loop as bodies — Scrapy's
        robots middleware downloads robots.txt through the retrying
        downloader too; a single-shot transient 503 must NOT read as
        allow-all for the whole round."""
        status, _, raw, _, _ = self._retrying(f"{self.scheme}://{host}/robots.txt")
        return raw.decode("utf-8", "replace") if status == 200 else ""


class LoopbackProxyFetcher:
    """Routes LOGICAL urls through a replay gateway on a single socket
    endpoint: ``https://hostN.example.org/records/7`` is fetched as
    ``{base_url}/hostN.example.org/records/7`` (and robots as
    ``{base_url}/{host}/robots.txt``). The WARC-replay / caching-proxy
    shape — the crawl plan keeps scheduling on logical hosts while all
    bytes flow over one real socket endpoint. This is what the loopback
    integration test drives through a ThreadingHTTPServer."""

    def __init__(self, base_url: str, max_attempts: int = 3, timeout_s: float = 10.0):
        self.base = base_url.rstrip("/")
        self.http = HttpFetcher(max_attempts=max_attempts, timeout_s=timeout_s)

    def __call__(self, url: str) -> dict:
        rest = url.split("://", 1)[1] if "://" in url else url
        return self.http(f"{self.base}/{rest}")

    def robots_txt(self, host: str) -> str:
        status, _, raw, _, _ = self.http._retrying(f"{self.base}/{host}/robots.txt")
        return raw.decode("utf-8", "replace") if status == 200 else ""
