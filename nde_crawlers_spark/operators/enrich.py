"""Enrichment joins: broadcast lookups, cache-miss anti-joins, theta joins.

The reference enriches documents through SQLite memo caches at every API
boundary (eutils_cache utils/pmid_helper.py:52-58, funder_cache
utils/funding_helper.py:18-29, lineage_lookup utils/lineage.py:29-37) with
the universal pattern:

    keys   = distinct keys from this batch
    hits   = lookup(keys) from the memo table
    misses = keys - hits          -> remote fetch -> memo insert
    apply  = map results back onto docs

Spark-first: the memo table is a DataFrame; hits are a broadcast (small
dim) or shuffle (large dim) equi-join; misses are a left-anti join; the
"remote fetch" for misses is a mapInPandas batch stage appended back to
the lookup table. The corrections pass adds a theta join: substring
containment of grant patterns (utils/corrections.py:331-359) — a
broadcast nested-loop join, cheap because the build side is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    docs: DataFrame, lookup: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Broadcast lookup join (J4/J5/J8/J14-J16 family). The lookup side is
    explicitly broadcast — these tables are bounded by vocabulary size
    (taxa, funders, ontology terms), not corpus size."""
    return docs.join(F.broadcast(lookup), on=on, how=how)


def cache_misses(keys: DataFrame, cache: DataFrame, key_col: str) -> DataFrame:
    """Keys not yet memoized: left-anti join vs the cache table
    (the `[p for p in pmids if p not in cached]` analog,
    utils/pmid_helper.py:770-771)."""
    return keys.select(key_col).distinct().join(cache.select(key_col), key_col, "left_anti")


def explode_join_collect(
    docs: DataFrame,
    array_col: str,
    lookup: DataFrame,
    lookup_key: str,
    id_col: str = "doc_id",
    result_col: str = "enriched",
) -> DataFrame:
    """The PMID-enrichment shape (J1): explode the per-doc key array, join
    the lookup, regroup per doc with collect_list, join back.

    explode -> join -> groupBy(id) -> join(id) is two shuffles; when the
    lookup is broadcastable the only shuffle is the final regroup."""
    exploded = docs.select(F.col(id_col), F.explode_outer(F.col(array_col)).alias(lookup_key))
    joined = exploded.join(F.broadcast(lookup), lookup_key, "left")
    val_cols = [c for c in lookup.columns if c != lookup_key]
    per_doc = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in [lookup_key, *val_cols]]))
        ).alias(result_col)
    )
    return docs.join(per_doc, id_col, "left")


def theta_contains_join(
    docs: DataFrame, patterns: DataFrame, text_col: str, pattern_col: str = "pattern"
) -> DataFrame:
    """Broadcast theta join on substring containment: one output row per
    (doc, matching pattern) — the corrections-by-grant-pattern join
    (utils/corrections.py:331-359). Build side must be small; Catalyst
    plans BroadcastNestedLoopJoin."""
    return docs.join(
        F.broadcast(patterns), F.col(text_col).contains(F.col(pattern_col)), "inner"
    )
