"""URL canonicalization + hashing kernel — pure column expressions.

This is the engine's analog of the reference's identity discipline:
``_id`` casefolding (reference: biothings-hub/files/nde-hub/utils/utils.py:394)
and the sha256 hash-key pattern used for the embedding cache
(reference: biothings-hub/files/nde-hub/hub/dataindex/embed.py:168-177).
The reference stores raw ``_id`` strings in a SQLite
``cache(_id TEXT PRIMARY KEY)`` (figshare_oai-pmh/files/sql_database.py:158-164);
at 10^10-URL scale we instead key everything on ``sha2(canonical_url, 256)``
so the seen-set and frontier partition uniformly.

Everything here is a Catalyst column expression — whole-stage-codegen'd,
pushdown-friendly, zero Python in the hot path. Canonicalization rules:

1. drop the ``#fragment``
2. lowercase scheme and host
3. strip default ports (``:443`` https, ``:80`` http)
4. sort query parameters (stable byte order)
5. strip trailing slashes from non-root paths; empty path -> ``/``

Hashing deliberately uses md5/sha256 (not xxhash64/Spark ``hash``) so the
DuckDB correctness oracle can reproduce every derived key bit-for-bit.
At production scale xxhash64 would shave cycles, but key derivation is
noise next to fetch + parse cost, and cross-engine verifiability is a
project requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# Number of host buckets: politeness scheduling partitions on this. At
# cluster scale set to ~4x executor count so AQE can coalesce; hosts per
# bucket >> 1 keeps executors busy despite per-host budgets (SURVEY §7.3).
DEFAULT_HOST_BUCKETS = 64


def _no_fragment(url: Column) -> Column:
    return F.split(url, "#").getItem(0)


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(_no_fragment(url), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _after_scheme(url: Column) -> Column:
    return F.regexp_replace(_no_fragment(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")


def _hostport(url: Column) -> Column:
    # authority ends at the first '/' OR '?' — a query can follow the
    # host directly (http://host?x=1)
    return F.regexp_extract(_after_scheme(url), r"^([^/?]*)", 1)


def url_host(url: Column) -> Column:
    """Lowercased host without port."""
    return F.lower(F.split(_hostport(url), ":").getItem(0))


def _port(url: Column) -> Column:
    hp = _hostport(url)
    return F.when(hp.contains(":"), F.split(hp, ":").getItem(1)).otherwise(F.lit(""))


def _path_and_query(url: Column) -> Column:
    rest = _after_scheme(url)
    return F.substring(rest, F.length(_hostport(url)) + F.lit(1), F.lit(1 << 20))


def url_path(url: Column) -> Column:
    """Canonical path: no trailing slash (root stays '/'), '' -> '/'."""
    raw = F.split(_path_and_query(url), r"\?").getItem(0)
    stripped = F.regexp_replace(raw, "/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def url_query_sorted(url: Column) -> Column:
    """Query string with params sorted bytewise; '' when absent."""
    pq = _path_and_query(url)
    q = F.when(pq.contains("?"), F.element_at(F.split(pq, r"\?", 2), 2)).otherwise(F.lit(""))
    return F.when(q == "", F.lit("")).otherwise(F.array_join(F.array_sort(F.split(q, "&")), "&"))


def canonical_url(url: Column) -> Column:
    scheme = url_scheme(url)
    host = url_host(url)
    port = _port(url)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
    )
    portpart = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    qs = url_query_sorted(url)
    qpart = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, portpart, url_path(url), qpart)


def url_hash(canon: Column) -> Column:
    """sha2-256 hex of the canonical URL — the engine-wide key."""
    return F.sha2(canon, 256)


def hex_digit(s: Column, pos: int) -> Column:
    """Value 0-15 of the 1-based ``pos``-th char of a lowercase hex string.
    Same recipe is expressible in the DuckDB oracle via strpos."""
    return F.call_function("locate", F.substring(s, pos, 1), F.lit(HEX)) - F.lit(1)


def host_bucket(host: Column, num_buckets: int = DEFAULT_HOST_BUCKETS) -> Column:
    """Deterministic host bucket: first two md5 hex digits of the host,
    mod ``num_buckets``. md5 (not xxhash64) so the oracle can mirror it."""
    h = F.md5(host)
    return F.pmod(hex_digit(h, 1) * 16 + hex_digit(h, 2), F.lit(num_buckets)).cast("int")


def hash_seq(canon: Column) -> Column:
    """Deterministic 'discovery sequence' surrogate: a 48-bit integer from
    the first 12 md5 hex digits of the canonical URL.

    Partitioning-independent — this is what makes crawl ordering
    reproducible at N vs 4N executors (BASELINE.json north_rule): the
    frontier's total order key is (priority, seq, url_hash), all pure
    functions of the URL itself, never of task scheduling."""
    h = F.md5(canon)
    acc: Column = F.lit(0).cast("long")
    for i in range(1, 13):
        acc = acc * 16 + hex_digit(h, i)
    return acc


def with_url_columns(
    df: DataFrame, url_col: str = "url", num_buckets: int = DEFAULT_HOST_BUCKETS
) -> DataFrame:
    """Standard projection: canonical_url, url_hash, host, host_bucket, path."""
    return (
        df.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .withColumn("url_hash", url_hash(F.col("canonical_url")))
        .withColumn("host", url_host(F.col(url_col)))
        .withColumn("host_bucket", host_bucket(F.col("host"), num_buckets))
        .withColumn("path", url_path(F.col(url_col)))
    )
