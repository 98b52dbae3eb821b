"""Deterministic synthetic crawl universe — seeds, robots rules, fetch corpus.

The sandbox has no network, so the "web" is a pure function of the URL:
``synth_fetch(url, attempt)`` returns the same (status, body, outlinks)
everywhere — inside Spark pandas-UDF batches, in the single-threaded
Python crawl oracle, at any parallelism. This mirrors how the reference
decouples crawl from parse via its SQLite cache (the parse stage is
re-runnable from cached bytes, figshare_oai-pmh/files/sql_database.py:241-253):
determinism lives in the data, not the scheduler.

Shapes mirror the reference corpus:
- hosts are Zipf(s≈1)-skewed so 1-2 hosts dominate (the Zenodo/ImmPort
  hot-host analog named by the north rule; zenodo/files/zenodo.py:281-308)
- bodies carry title/description/keyword/author/date text fields plus
  media URLs (distribution.contentUrl analog, zenodo/files/zenodo.py:143-149)
- each page links 0-5 further URLs, mostly same-host (the link frontier
  of tycho_crawler/files/spider.py:30-47)
- status codes: 200 93%, 404 3%, 429 2% (retry-after), 500 2%
  (retry/backoff analog of utils/utils.py:69-100 and
  dataverse/files/dataverse.py:40-52)
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache as _lru_cache

WORDS = (
    "immune viral genome assay cohort serum antibody pathogen vaccine host "
    "clinical trial sample sequence protein epitope strain infection response "
    "dataset metadata archive repository study analysis model screen panel"
).split()

MEDIA_EXT = ["jpg", "png", "mp4", "wav", "pdf"]

DEFAULT_CRAWL_DELAY_MS = 500  # reference DOWNLOAD_DELAY=0.5s (tycho settings.py:2)


def _h(s: str) -> bytes:
    return hashlib.md5(s.encode("utf-8")).digest()


def _frac(s: str) -> float:
    """Uniform [0,1) from md5."""
    return int.from_bytes(_h(s)[:8], "big") / 2**64


# byte -> word lookup: WORDS[b % len(WORDS)] pre-resolved for all 256
# byte values, so _words_for does list indexing instead of a modulo per
# emitted word (the fetch bench showed the per-word genexpr as the
# single hottest line of the fused fetch+parse stage)
_WORD_BY_BYTE = [WORDS[b % len(WORDS)] for b in range(256)]


def host_name(rank: int) -> str:
    return f"host-{rank:04d}.example.org"


@_lru_cache(maxsize=64)
def _log_hosts(num_hosts: int) -> float:
    return math.log(num_hosts + 1)


def zipf_host_rank(key: str, num_hosts: int) -> int:
    """Zipf(s=1)-ish rank via inverse log CDF: P(rank<=r) = ln(r+1)/ln(H+1)."""
    u = _frac("host:" + key)
    return min(int(math.exp(u * _log_hosts(num_hosts))) - 1, num_hosts - 1)


def make_seeds(num_urls: int, num_hosts: int, seed: int = 42) -> list[dict]:
    """Deterministic seed list. Skewed hosts, mixed canonicalization noise
    (uppercase hosts, default ports, unsorted query params, fragments) so
    the canonicalizer earns its keep; some /private/ URLs to exercise the
    robots filter."""
    out = []
    for i in range(num_urls):
        key = f"{seed}:{i}"
        r = zipf_host_rank(key, num_hosts)
        host = host_name(r)
        noise = int(_frac("noise:" + key) * 16)
        path = f"/records/{i}"
        if i % 31 == 7:
            path = f"/private/{i}"  # robots-disallowed on some hosts
        url = f"https://{host}{path}"
        if noise & 1:
            url = url.replace("https://", "HTTPS://").replace("example", "Example")
        if noise & 2:
            url = url.replace(".org/", ".org:443/")
        if noise & 4:
            url += "/?b=2&a=1"
        if noise & 8:
            url += "#frag"
        out.append(
            {
                "url": url,
                "priority": int(_frac("prio:" + key) * 10),
                "source": f"src{r % 8}",
                "seed_seq": i,
            }
        )
    return out


def robots_rules(host: str) -> dict:
    """Pure-function robots record for a host (robots_cache analog;
    ROBOTSTXT_OBEY, tycho_crawler/files/settings.py:6). ~25% of hosts
    disallow /private/; crawl delay 0/500/2000 ms by host hash."""
    f = _frac("robots:" + host)
    disallow = ["/private/"] if f < 0.25 else []
    g = _frac("delay:" + host)
    delay = 0 if g < 0.1 else (2000 if g > 0.9 else DEFAULT_CRAWL_DELAY_MS)
    return {"host": host, "disallow_prefixes": disallow, "crawl_delay_ms": delay}


def render_robots_txt(host: str) -> str:
    """Serialize a host's robots rules into an actual robots.txt body —
    the wire form the crawl plan fetches and runs through the REAL parser
    (operators/robots.py::parse_robots_txt). parse(render(host)) must
    round-trip to robots_rules(host) exactly (property-tested)."""
    r = robots_rules(host)
    lines = ["# synthetic robots", "User-agent: *"]
    lines += [f"Disallow: {p}" for p in r["disallow_prefixes"]]
    lines.append(f"Crawl-delay: {r['crawl_delay_ms'] / 1000:g}")
    return "\n".join(lines)


def _status_draw(url: str, attempt: int) -> int:
    f = int.from_bytes(
        hashlib.md5(f"status:{url}#a{attempt}".encode("utf-8")).digest()[:8], "big"
    ) / 2**64
    if f < 0.93:
        return 200
    if f < 0.96:
        return 404
    if f < 0.98:
        return 429
    return 500


def synth_status(url: str, max_attempts: int = 3) -> tuple[int, int]:
    """(final_status, attempts): retry 429/500 up to max_attempts with a
    fresh deterministic draw per attempt (bounded-retry analog of
    utils/utils.py:69-100)."""
    status = 500
    for a in range(max_attempts):
        status = _status_draw(url, a)
        if status not in (429, 500):
            return status, a + 1
    return status, max_attempts


def oai_list_records(
    source_id: str, token: str | None, total: int, page_size: int = 25
) -> tuple[list[tuple[str, int, str]], str | None]:
    """Pure-function OAI-PMH endpoint: ListRecords(source, resumptionToken)
    -> (records, next_token). Token encodes the cursor, exactly like the
    reference's sequential token walk (figshare_oai-pmh/files/
    oai_helper.py:36-185); None terminates the chain. Records are
    (source_id, rec_seq, payload)."""
    start = 0 if token is None else int(token.rsplit("@", 1)[1])
    end = min(start + page_size, total)
    recs = [
        (source_id, i, _words_for(f"oai:{source_id}:{i}", 6)) for i in range(start, end)
    ]
    nxt = f"{source_id}@{end}" if end < total else None
    return recs, nxt


def synth_latency_ms(canonical_url: str) -> int:
    """Deterministic 'observed fetch latency' for a URL (ms) — DATA, not
    wall-clock, so AutoThrottle adaptation (plans/crawl.py) is a pure
    function of the corpus and crawl scheduling stays bit-identical at
    any parallelism (the north rule's N-vs-4N invariant). Host-level
    bias: ~25% of hosts are systematically SLOW (+1200 ms), the rest
    fast, plus per-URL jitter — so per-host adapted delays genuinely
    diverge (slow host's budget shrinks, fast host's grows)."""
    host = host_of_url(canonical_url)
    jitter = int(
        int.from_bytes(
            hashlib.md5(("lat:" + canonical_url).encode("utf-8")).digest()[:8], "big"
        ) / 2**64 * 240
    )
    return (1200 if _host_slow(host) else 80) + jitter


@_lru_cache(maxsize=65536)
def _host_slow(host: str) -> bool:
    """Host-level slow draw, memoized per worker process: the draw is a
    pure function of the host and a crawl touches few thousand distinct
    hosts, so the md5 re-derivation per URL was pure waste."""
    return _frac("lat-host:" + host) < 0.25


def host_of_url(url: str) -> str:
    rest = url.split("://", 1)[1] if "://" in url else url
    return rest.split("/")[0].split("?")[0].split(":")[0].lower()


def retry_after_s(url: str) -> int:
    """Deterministic Retry-After header value (2..8 s) a host sends with
    a 429 — the dataverse cooldown analog (dataverse/files/dataverse.py:
    20-52). Pure function of the URL so every engine sees the same
    cooldown."""
    return 2 + int(_frac("ra:" + url) * 7)


def _words_for(key: str, n: int) -> str:
    """Same words as ``" ".join(WORDS[d[i % 16] % len(WORDS)] for i in
    range(n))`` — the i % 16 cycle over the digest is expressed as list
    repetition and the per-word modulo as the ``_WORD_BY_BYTE`` table
    (byte-identical output, ~2x fewer interpreter ops per word)."""
    d = _h(key)
    ws = [_WORD_BY_BYTE[b] for b in d]
    if n <= 16:
        return " ".join(ws[:n])
    return " ".join((ws * ((n + 15) // 16))[:n])


def synth_body(canonical_url: str, num_hosts: int) -> dict:
    """Deterministic page for a canonical URL.

    Returns ``{"kind", "title", "description", "keywords", "author",
    "date", "media", "outlinks"}``. ``kind`` rotates through the
    reference's parser families (html/xml/json). Outlinks: 0-5, ~80%
    same-host (/records/k), rest cross-host — drives frontier growth."""
    k = canonical_url
    d = _h("body:" + k)
    kind = ["html", "xml", "json", "soft"][d[0] % 4]
    # ~25% of html pages carry their metadata ONLY as an embedded
    # schema.org JSON-LD script (the JSON-LD scrape-fallback family,
    # hub/dataload JSON-LD sources) — exercises the HTMLParser path
    jsonld = kind == "html" and d[13] % 4 == 0
    title = _words_for("title:" + k, 4 + d[1] % 4)
    desc = _words_for("desc:" + k, 20 + d[2] % 30)
    keywords = [_words_for(f"kw{j}:{k}", 1) for j in range(1 + d[3] % 4)]
    author = f"author-{d[4] % 50:03d}"
    date = f"202{d[5] % 5}-{1 + d[6] % 12:02d}-{1 + d[7] % 28:02d}"
    # 0-2 embedded samples: the SRA study -> dataset + N sample-docs
    # fan-out shape (ncbi_sra/files/ncbi_sra.py:381+, one fetched record
    # emits several documents)
    samples = [
        {
            "title": _words_for(f"stitle{j}:{k}", 3),
            "description": _words_for(f"sdesc{j}:{k}", 8),
        }
        for j in range(d[12] % 3)
    ]
    n_media = d[8] % 3
    media = [
        f"https://media-{d[9 + j] % 20:02d}.example.org/files/{int.from_bytes(d[j:j+4], 'big') % 10**6}.{MEDIA_EXT[d[10 + j] % len(MEDIA_EXT)]}"
        for j in range(n_media)
    ]
    # outlinks
    host = k.split("://", 1)[1].split("/", 1)[0]
    n_links = d[11] % 6
    outlinks = []
    for j in range(n_links):
        lk = f"link{j}:{k}"
        tgt = int(_frac("t:" + lk) * 10**7)
        if _frac("x:" + lk) < 0.8:
            outlinks.append(f"https://{host}/records/{tgt}")
        else:
            r = zipf_host_rank(lk, num_hosts)
            outlinks.append(f"https://{host_name(r)}/records/{tgt}")
    return {
        "kind": kind,
        "title": title,
        "description": desc,
        "keywords": keywords,
        "author": author,
        "date": date,
        "media": media,
        "outlinks": outlinks,
        "samples": samples,
        "jsonld": jsonld,
    }


def render_body(page: dict) -> str:
    """Serialize the logical page into its wire format (the fetch payload
    that parse() must re-extract — html/xml/json per parser family)."""
    kind = page["kind"]
    samples = page.get("samples", [])
    if kind == "html" and page.get("jsonld"):
        import json

        payload = json.dumps(
            {
                "name": page["title"],
                "description": page["description"],
                "keywords": page["keywords"],
                "author": {"name": page["author"]},
                "datePublished": page["date"],
                "distribution": [{"contentUrl": m} for m in page["media"]],
                "samples": [
                    {"title": s["title"], "description": s["description"]} for s in samples
                ],
            },
            sort_keys=True,
        )
        links = "".join(f'<a href="{u}">link</a>' for u in page["outlinks"])
        return (
            f'<html><head><script type="application/ld+json">{payload}</script></head>'
            f"<body>{links}</body></html>"
        )
    if kind == "html":
        kws = "".join(f'<meta name="keywords" content="{w}"/>' for w in page["keywords"])
        media = "".join(f'<img src="{m}"/>' for m in page["media"])
        links = "".join(f'<a href="{u}">link</a>' for u in page["outlinks"])
        smp = "".join(
            f'<div class="sample"><b class="st">{s["title"]}</b>'
            f'<i class="sd">{s["description"]}</i></div>'
            for s in samples
        )
        return (
            f"<html><head><title>{page['title']}</title>{kws}</head>"
            f"<body><p class=\"desc\">{page['description']}</p>"
            f"<span class=\"author\">{page['author']}</span>"
            f"<time>{page['date']}</time>{media}{links}{smp}</body></html>"
        )
    if kind == "xml":
        kws = "".join(f"<subject>{w}</subject>" for w in page["keywords"])
        media = "".join(f"<contentUrl>{m}</contentUrl>" for m in page["media"])
        links = "".join(f"<relatedIdentifier>{u}</relatedIdentifier>" for u in page["outlinks"])
        smp = "".join(
            f"<sample><sampleTitle>{s['title']}</sampleTitle>"
            f"<sampleDesc>{s['description']}</sampleDesc></sample>"
            for s in samples
        )
        return (
            f"<resource><titles><title>{page['title']}</title></titles>"
            f"<descriptions><description>{page['description']}</description></descriptions>"
            f"<creators><creatorName>{page['author']}</creatorName></creators>"
            f"<dates><date>{page['date']}</date></dates>{kws}{media}{links}{smp}</resource>"
        )
    if kind == "json":
        import json

        return json.dumps(
            {
                "name": page["title"],
                "description": page["description"],
                "keywords": page["keywords"],
                "author": {"name": page["author"]},
                "datePublished": page["date"],
                "distribution": [{"contentUrl": m} for m in page["media"]],
                "links": page["outlinks"],
                "samples": [
                    {"title": s["title"], "description": s["description"]} for s in samples
                ],
            },
            sort_keys=True,
        )
    # SOFT flat-file flavor: line-oriented `!Key = value` accumulation,
    # repeated keys for list fields (GEO SOFT analog,
    # hub/dataload/sources/ncbi_geo/parser.py:30-53)
    lines = [
        f"!Series_title = {page['title']}",
        f"!Series_summary = {page['description']}",
        f"!Series_contributor = {page['author']}",
        f"!Series_submission_date = {page['date']}",
    ]
    lines += [f"!Series_keyword = {w}" for w in page["keywords"]]
    lines += [f"!Series_supplementary_file = {m}" for m in page["media"]]
    lines += [f"!Series_relation = {u}" for u in page["outlinks"]]
    for s in samples:
        lines += [
            f"!Sample_title = {s['title']}",
            f"!Sample_summary = {s['description']}",
        ]
    return "\n".join(lines)


def synth_fetch(canonical_url: str, num_hosts: int, max_attempts: int = 3) -> dict:
    """The full deterministic 'network': status + wire body + metadata."""
    status, attempts = synth_status(canonical_url, max_attempts)
    if status != 200:
        return {
            "status": status,
            "attempts": attempts,
            "kind": "",
            "body": "",
            "bytes": 0,
            "retry_after_s": retry_after_s(canonical_url) if status == 429 else 0,
            "latency_ms": synth_latency_ms(canonical_url),
        }
    page = synth_body(canonical_url, num_hosts)
    body = render_body(page)
    return {
        "status": 200,
        "attempts": attempts,
        "kind": page["kind"],
        "body": body,
        "bytes": len(body.encode("utf-8")),
        "retry_after_s": 0,
        "latency_ms": synth_latency_ms(canonical_url),
    }
