"""Embedding generation with a persistent memo cache.

Re-expresses the reference's post-index embedding pass
(hub/dataindex/embed.py): texts are keyed by sha256
(embed.py:168-177), looked up in an ``embedding_cache`` SQLite memo
(embed.py:39-42,218), and only misses go to batched remote inference
(256 texts/call, embed.py:28-30). The Spark-first shape:

    keys    = sha256(normalized text)
    hits    = cache JOIN keys              (bucketed equi-join)
    misses  = keys LEFT ANTI cache         (the cache-miss set difference)
    embed   = mapInPandas batch inference over misses
    cache'  = cache UNION new rows         (append-only memo table)
    result  = docs JOIN cache' ON key

The "inference" here is a deterministic stub (hash-derived unit vector)
— the container has no model — but batching, schema, and the
miss-only-compute economics are the real thing: on a re-run over an
updated corpus only changed texts hit the model.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CACHE_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def text_keys(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text, text_hash): the sha256 memo key over the casefolded text."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.sha2(F.lower(F.col(text_col)), 256).alias("text_hash"),
    )


def stub_embed(text: str, dim: int = 16) -> list[float]:
    """Deterministic fake embedding: sha256-derived, L2-normalized-ish.
    Swapped for the real model client on a cluster; contract unchanged."""
    d = hashlib.sha256(text.lower().encode("utf-8")).digest()
    raw = [(b - 127.5) / 127.5 for b in d[:dim]]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [round(x / norm, 6) for x in raw]


def embed_misses(misses: DataFrame, dim: int = 16, batch_size: int = 256) -> DataFrame:
    """Batched 'inference' over cache misses (one distinct text_hash per
    row). batch_size mirrors EMBED_BATCH_SIZE=256 (embed.py:28)."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[i : i + batch_size]
                yield pd.DataFrame(
                    {
                        "text_hash": chunk["text_hash"].values,
                        "embedding": [stub_embed(t, dim) for t in chunk["text"]],
                    }
                )

    return misses.select("text_hash", "text").mapInPandas(_embed, schema=CACHE_SCHEMA)


def embed_with_cache(
    docs: DataFrame,
    cache: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """-> (docs with `embedding`, updated cache). Only cache misses are
    embedded; duplicate texts across docs embed once (distinct on key)."""
    keyed = text_keys(docs, id_col, text_col)
    distinct_keys = keyed.select("text_hash", "text").dropDuplicates(["text_hash"])
    misses = distinct_keys.join(cache.select("text_hash"), "text_hash", "left_anti")
    new_rows = embed_misses(misses, dim=dim)
    cache2 = cache.unionByName(new_rows)
    enriched = (
        keyed.join(cache2, "text_hash", "left")
        .select(F.col("id").alias(id_col), "text_hash", "embedding")
    )
    return enriched, cache2
