"""The wide nested NDE record schema — the engine's in-flight data model.

The reference's entire pipeline moves giant nested Dataset/Tool/
ResourceCatalog/Sample documents whose shape is pinned by the uploader
mappings (biothings-hub/files/nde-hub/hub/dataload/nde.py:130-1404 for
Dataset/Tool, 1418-2234 for Sample, union'd via merge_struct
nde.py:2237-2247) with scalar-or-list normalization applied everywhere a
source may emit either (utils/utils.py:118-123,152). This module is the
typed Spark analog:

- ``NDE_SCHEMA``      — one nested StructType carrying the load-bearing
                        fields (author[], funding[], distribution[],
                        includedInDataCatalog[], spatialCoverage[].geo,
                        species[]/infectiousAgent[]/healthCondition[],
                        sameAs[], creativeWorkStatus, the date quartet,
                        ``_meta.lineage``). The Dataset and Sample
                        mappings live in ONE struct — Spark's analog of
                        merge_struct is a union schema, absent fields
                        null (unionByName(allowMissingColumns=True)).
- ``ensure_array``    — always-array canonicalization at the source
                        boundary: a scalar-typed column becomes a 1-array,
                        null becomes [] (utils.py:118-123,152). In a
                        typed engine "sometimes scalar, sometimes list"
                        is a per-SOURCE property, not per-row, so the
                        coercion happens once per source before the
                        union — free at scale (pure projection).
- ``entity_array``    — scalar name -> [struct<name>] (the
                        {"name": x} wrapping sprinkled through uploaders)
- ``schema_violation_nde`` — check_schema (utils/utils.py:103-137) as a
                        quarantine diagnosis column, including the Sample
                        creativeWorkStatus enum gate (utils.py:129-136)
                        and the includedInDataCatalog.archivedAt rule
                        (utils.py:117-123).
- ``spans_to_nde``    — the uploader surface: crawled interleaved spans
                        -> a full NDE record (replaces the flat
                        spans_to_fields projection as the canonical
                        post-parse step).

Everything here is row-local projection — codegen'd, scan-bound at
100 TB, no shuffle introduced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACCESS_ENUM = ["Open", "Restricted", "Closed", "Embargoed"]
# Sample-only status vocabulary (utils/utils.py:129-136)
CREATIVE_WORK_STATUS_ENUM = ["Bespoke", "Available", "Backordered", "Retired"]

_ENTITY = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("identifier", T.StringType()),
])

NDE_SCHEMA = T.StructType([
    T.StructField("_id", T.StringType()),
    T.StructField("type", T.StringType()),          # @type
    T.StructField("name", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("author", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("givenName", T.StringType()),
        T.StructField("familyName", T.StringType()),
        T.StructField("sameAs", T.StringType()),
    ]))),
    T.StructField("funding", T.ArrayType(T.StructType([
        T.StructField("identifier", T.StringType()),
        T.StructField("funder", T.StructType([
            T.StructField("name", T.StringType()),
        ])),
    ]))),
    T.StructField("distribution", T.ArrayType(T.StructType([
        T.StructField("contentUrl", T.StringType()),
        T.StructField("encodingFormat", T.StringType()),
        T.StructField("dateModified", T.DateType()),
    ]))),
    T.StructField("includedInDataCatalog", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("archivedAt", T.StringType()),
    ]))),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("sameAs", T.ArrayType(T.StringType())),
    T.StructField("measurementTechnique", T.ArrayType(_ENTITY)),
    T.StructField("species", T.ArrayType(_ENTITY)),
    T.StructField("infectiousAgent", T.ArrayType(_ENTITY)),
    T.StructField("healthCondition", T.ArrayType(_ENTITY)),
    T.StructField("spatialCoverage", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("geo", T.StructType([
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
        ])),
    ]))),
    T.StructField("conditionsOfAccess", T.StringType()),
    T.StructField("creativeWorkStatus", T.StringType()),
    T.StructField("date", T.DateType()),
    T.StructField("dateCreated", T.DateType()),
    T.StructField("dateModified", T.DateType()),
    T.StructField("datePublished", T.DateType()),
    T.StructField("_meta", T.StructType([
        T.StructField("lineage", T.ArrayType(T.StructType([
            T.StructField("taxon", T.IntegerType()),
            T.StructField("parent_taxon", T.IntegerType()),
        ]))),
    ])),
])


def ensure_array(c: Column, elem_type: str = "string") -> Column:
    """Always-array canonicalization for a scalar-typed source column:
    NULL -> [], x -> [x] (utils/utils.py:118-123,152). Apply at the
    source boundary, before the cross-source unionByName."""
    return F.when(c.isNull(), F.array().cast(f"array<{elem_type}>")).otherwise(F.array(c))


def entity_array(name_col: Column, identifier_col: Column | None = None) -> Column:
    """Scalar entity name -> [struct<name, identifier>] ({"name": x}
    wrapping); NULL/empty name -> []."""
    ident = identifier_col if identifier_col is not None else F.lit(None).cast("string")
    e = F.struct(name_col.alias("name"), ident.alias("identifier"))
    return F.when(
        name_col.isNull() | (name_col == ""), F.array().cast(_ENTITY_SQL)
    ).otherwise(F.array(e))


_ENTITY_SQL = "array<struct<name:string,identifier:string>>"


def schema_violation_nde(
    type_col: Column,
    url_col: Column,
    access_col: Column,
    catalog_col: Column | None = None,
    creative_status_col: Column | None = None,
) -> Column:
    """check_schema (utils/utils.py:103-137) as a first-violation
    diagnosis column (NULL == valid): @type and url present,
    includedInDataCatalog entries all carry archivedAt,
    conditionsOfAccess in its enum, and — Sample records only —
    creativeWorkStatus in its enum."""
    v = (
        F.when(type_col.isNull() | (type_col == ""), F.lit("missing_type"))
        .when(url_col.isNull() | (url_col == ""), F.lit("missing_url"))
    )
    if catalog_col is not None:
        missing_archived = F.exists(
            catalog_col,
            lambda e: e.getField("archivedAt").isNull() | (e.getField("archivedAt") == ""),
        )
        # NULL catalog must be caught explicitly: F.size(NULL) and
        # F.exists(NULL, ...) both yield NULL, so without the isNull()
        # disjunct a null-catalog record would sail through as valid —
        # check_schema (utils/utils.py:117) asserts the field is present.
        v = v.when(
            catalog_col.isNull() | (F.size(catalog_col) == 0) | missing_archived,
            F.lit("missing_included_in_data_catalog_archived_at"),
        )
    v = v.when(
        access_col.isNotNull() & ~access_col.isin(*ACCESS_ENUM),
        F.lit("invalid_conditions_of_access"),
    )
    if creative_status_col is not None:
        v = v.when(
            (type_col == "Sample")
            & creative_status_col.isNotNull()
            & ~creative_status_col.isin(*CREATIVE_WORK_STATUS_ENUM),
            F.lit("invalid_creative_work_status"),
        )
    return v.otherwise(F.lit(None).cast("string"))


def promote_doi_id(id_col: Column, doi_col: Column) -> tuple[Column, Column]:
    """merge_duplicates (utils/utils.py:189-204): a record whose doi is a
    single value becomes addressable BY that doi (_id = doi) so
    cross-source duplicates collapse at upsert time; a literal
    'none'/'NONE' doi is dropped instead. ``doi_col`` is the canonical
    always-array form; multi-doi records keep their original _id.
    Returns (new_id, new_doi) column pair."""
    one = F.size(doi_col) == 1
    v = F.try_element_at(doi_col, F.lit(1))  # NULL (not error) on empty arrays
    is_none = F.lower(v) == "none"
    new_id = F.when(one & ~is_none, v).otherwise(id_col)
    new_doi = F.when(one & is_none, F.array().cast("array<string>")).otherwise(doi_col)
    return new_id, new_doi


def spans_to_nde(docs: DataFrame, catalog_name: str = "nde-spark") -> DataFrame:
    """The uploader surface: interleaved crawl spans -> a full NDE record
    in ``NDE_SCHEMA`` shape. Every mapping rule is a row-local column
    expression over the short span array:

    - title span          -> name
    - description span    -> description
    - author span         -> author[] ({"name": ...} entity wrapping)
    - date span           -> datePublished
    - keyword spans       -> keywords[]
    - media spans         -> distribution[] (contentUrl + encodingFormat
                             from the file extension — the
                             distribution.contentUrl analog,
                             zenodo/files/zenodo.py:143-149)
    - provenance          -> includedInDataCatalog[] single entry with
                             archivedAt (check_schema's required field)
    """
    s = F.col("spans")

    def first_text(kind: str) -> Column:
        hits = F.filter(s, lambda e: e.getField("kind") == kind)
        # NULL when the kind is absent (try_: no ANSI error on empty)
        return F.try_element_at(hits, F.lit(1)).getField("text")

    media_refs = F.transform(
        F.filter(s, lambda e: e.getField("kind") == "media"),
        lambda e: e.getField("media_ref"),
    )
    ext = lambda m: F.regexp_extract(m, r"\.([a-z0-9]+)$", 1)  # noqa: E731

    # fan-out docs (doc_id = url_hash#sK) are Sample records — they get
    # the Sample mapping's @type and a creativeWorkStatus from the valid
    # enum (deterministic by doc hash), which the schema gate checks
    is_sample = F.col("doc_id").contains("#s")
    cws_enum = F.array(*[F.lit(x) for x in CREATIVE_WORK_STATUS_ENUM])
    cws_pick = F.element_at(
        cws_enum,
        (F.conv(F.substring(F.md5(F.col("doc_id")), 1, 2), 16, 10).cast("int") % 4) + 1,
    )

    return docs.select(
        *[c for c in docs.columns if c != "spans"],
        F.lower(F.concat(F.lit(catalog_name), F.lit(":"), F.col("doc_id"))).alias("_id"),
        F.when(is_sample, F.lit("Sample")).otherwise(F.lit("Dataset")).alias("type"),
        F.when(is_sample, cws_pick).otherwise(F.lit(None).cast("string")).alias("creativeWorkStatus"),
        first_text("title").alias("name"),
        F.col("canonical_url").alias("url"),
        first_text("description").alias("description"),
        F.transform(
            F.filter(s, lambda e: e.getField("kind") == "author"),
            lambda e: F.struct(
                e.getField("text").alias("name"),
                F.lit(None).cast("string").alias("givenName"),
                F.lit(None).cast("string").alias("familyName"),
                F.lit(None).cast("string").alias("sameAs"),
            ),
        ).alias("author"),
        F.transform(
            media_refs,
            lambda m: F.struct(
                m.alias("contentUrl"),
                ext(m).alias("encodingFormat"),
                F.lit(None).cast("date").alias("dateModified"),
            ),
        ).alias("distribution"),
        F.transform(
            F.filter(s, lambda e: e.getField("kind") == "keyword"),
            lambda e: e.getField("text"),
        ).alias("keywords"),
        F.array(
            F.struct(
                F.lit(catalog_name).alias("name"),
                F.col("canonical_url").alias("url"),
                F.col("canonical_url").alias("archivedAt"),
            )
        ).alias("includedInDataCatalog"),
        F.to_date(first_text("date")).alias("datePublished"),
    )
