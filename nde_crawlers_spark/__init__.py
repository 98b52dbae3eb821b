"""nde_crawlers_spark — a from-scratch PySpark-native harvesting engine.

Re-expresses the query/data-processing capabilities of
NIAID-Data-Ecosystem/nde-crawlers (a ~60-container web-scale metadata
harvesting system) as an idiomatic Spark DataFrame engine:

- URL canonicalization + hashing kernel (pure column expressions)
- Partitioned URL-seen filter (left-anti join + bloom prefilter)
- Host-bucketed politeness priority queue (deterministic top-k per host)
- Vectorized fetch dispatch + NDE-span normalization (Arrow pandas UDFs)
- Checkpointed, resumable frontier rounds with per-partition lineage
- Cross-source merge/dedup joins, enrichment broadcast joins
- Training-data pipeline ops: exact/MinHash/SimHash dedup, ANN similarity,
  language ID, quality scoring, multimodal column plumbing

Reference behavior studied at /root/reference (see SURVEY.md for the
operator-by-operator file:line mapping). No code is ported; the
architecture is Spark-first (DataFrame/Catalyst/AQE), designed for
1000-executor clusters at 10^10-URL frontier scale and verified at small
scale against a DuckDB oracle plus a straight-line Python crawl oracle.
"""

__version__ = "0.1.0"
