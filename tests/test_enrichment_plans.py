"""Tests: embedding memo cache (miss-only compute), incremental harvest
(window checkpoints, crash resume, TTL expiry, stale-source guard),
wrapper-pass operators."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from nde_crawlers_spark.operators import wrapper as W
from nde_crawlers_spark.operators.embed import CACHE_SCHEMA, embed_with_cache, stub_embed
from nde_crawlers_spark.plans.incremental import IncrementalHarvest

from .conftest import SF001


def test_embed_with_cache_miss_only_compute(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet").limit(50)
    empty = spark.createDataFrame([], CACHE_SCHEMA)
    enriched, cache1 = embed_with_cache(docs, empty)
    cache1 = cache1.cache()
    n_docs, n_cache = enriched.count(), cache1.count()
    assert n_docs == 50
    assert n_cache == docs.select(F.sha2(F.lower("text"), 256)).distinct().count()
    # values match the deterministic stub
    row = enriched.join(docs, "doc_id").select("text", "embedding").first()
    assert [round(x, 6) for x in row["embedding"]] == stub_embed(row["text"])
    # second pass: zero new cache rows (all hits)
    _, cache2 = embed_with_cache(docs, cache1)
    assert cache2.count() == n_cache
    cache1.unpersist()


def _events(spark):
    return spark.read.parquet(f"{SF001}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )


LO = datetime(2024, 1, 1)
HI = datetime(2024, 1, 31)
STEP = timedelta(days=10)


def test_incremental_harvest_resume_and_ttl(spark):
    ev = _events(spark)
    full = ev.filter((F.col("ts") >= F.lit(LO)) & (F.col("ts") < F.lit(HI))).count()

    # crash before window 2, then resume: no loss, no duplicates
    d = tempfile.mkdtemp(prefix="ih_")
    h = IncrementalHarvest(spark, d, expire_days=90)
    with pytest.raises(RuntimeError, match="injected"):
        h.harvest(ev, "ts", LO, HI, STEP, now=HI, fail_at_window=2)
    assert h.checkpoint() is not None
    metas = h.harvest(ev, "ts", LO, HI, STEP, now=HI)
    assert len(metas) == 1  # only the remaining window re-ran
    assert h.harvested().count() == full
    assert h.harvested().select("event_id").distinct().count() == full

    # up-to-date checkpoint -> nothing to do
    assert h.harvest(ev, "ts", LO, HI, STEP, now=HI) == []

    # TTL expiry -> full re-harvest plan from lo
    start, windows = h.plan_windows(LO, HI, STEP, now=HI + timedelta(days=365))
    assert start == LO and len(windows) == 3

    # stale-source guard: source watermark behind the checkpoint
    with pytest.raises(RuntimeError, match="monotone-release"):
        h.plan_windows(LO, HI - timedelta(days=30), STEP, now=HI)


def test_adaptive_window_halving(spark):
    """A failing full-width window splits recursively (interval-halving
    retry, sql_database.py:428-464) and the harvest still completes with
    the full row set."""
    ev = _events(spark)
    full = ev.filter((F.col("ts") >= F.lit(LO)) & (F.col("ts") < F.lit(HI))).count()
    d = tempfile.mkdtemp(prefix="ihа_")
    h = IncrementalHarvest(spark, d, expire_days=90)
    metas = h.harvest_adaptive(
        ev, "ts", LO, HI, STEP, now=HI,
        failing={LO.isoformat()},  # first 10-day window fails at full width
    )
    widths = [m["width_s"] for m in metas]
    assert min(widths) < STEP.total_seconds()  # halving happened
    assert h.harvested().count() == full
    assert h.harvested().select("event_id").distinct().count() == full


def test_wrapper_operators(spark):
    df = spark.createDataFrame(
        [
            ("ID:One", "Dataset", "https://x", "Open", "2020-01-05", None, "2020-01-02",
             [{"name": "Mus musculus"}, {"name": " N/A "}, {"name": "unknown"}]),
            ("id:two", None, "https://y", "Restricted", None, "2021-06-01", "2020-01-01",
             [{"name": "Homo sapiens"}]),
            ("id:three", "Sample", None, "Weird", "2020-01-01", "2020-01-01", "2020-01-01", []),
        ],
        "id string, type string, url string, access string, d1 string, d2 string, d3 string,"
        " species array<struct<name:string>>",
    ).select(
        W.casefold_id(F.col("id")).alias("id"), "type", "url", "access",
        W.add_date(F.col("d1").cast("date"), F.col("d2").cast("date"), F.col("d3").cast("date")).alias("latest"),
        W.placeholder_filter(F.col("species")).alias("species"),
        W.schema_violation(F.col("type"), F.col("url"), F.col("access")).alias("violation"),
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"id:one", "id:two", "id:three"}
    assert str(rows["id:one"]["latest"]) == "2020-01-05"
    assert str(rows["id:two"]["latest"]) == "2021-06-01"
    assert [e["name"] for e in rows["id:one"]["species"]] == ["Mus musculus"]
    assert rows["id:one"]["violation"] is None
    assert rows["id:two"]["violation"] == "missing_type"
    assert rows["id:three"]["violation"] == "missing_url"  # url checked before enum
    valid, quarantined = W.check_schema_gate(
        df, F.col("violation")
    )
    assert valid.count() == 1 and quarantined.count() == 2


def test_round2_plans_broadcast_and_anti_join(spark):
    """Physical-plan assertions for the round-2 scale fixes:
    apply_merge_directives must broadcast both the gain join and the
    loser delete (the documents table is never shuffled), and the
    ngram-jaccard stop-shingle cap must remove hot shingles via a
    broadcast anti-join."""
    from nde_crawlers_spark.queries import dedup_ngram_jaccard, merge_apply_1x1

    plan = merge_apply_1x1(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti, BuildRight" in plan or "LeftAnti" in plan
    # the big side (documents scan) is never exchanged by the merge apply
    # itself: every Exchange in this plan is a broadcast exchange or
    # belongs to the tiny directives aggregation, not a repartition of
    # the documents table by join key
    assert "SortMergeJoin" not in plan

    # round-3 postings form: the df cap is enforced INSIDE the postings
    # aggregation (no stop-list anti-join pass), and the exploded corpus
    # is never self-joined — pairs are generated row-locally from each
    # postings list, so the only joins left are the two per-doc size
    # lookups
    jplan = dedup_ngram_jaccard(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in jplan
    import re as _re
    assert len(_re.findall(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", jplan)) <= 2


def test_lineage_closure_iterates_taxonomy_not_corpus(spark):
    """The lineage closure's iteration count depends on taxonomy depth
    only; expanding docs is ONE broadcast join regardless of chain
    length."""
    from pyspark.sql import functions as F2

    from nde_crawlers_spark.operators.lineage import expand_lineage, taxonomy_closure

    tax = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3), (5, 4)], "taxon int, parent_taxon int"
    )
    closure = taxonomy_closure(tax)
    got = {
        (r["taxon"], r["member"], r["member_parent"]) for r in closure.collect()
    }
    # taxon 5's lineage: itself plus every ancestor, each with its parent
    assert {(5, 5, 4), (5, 4, 3), (5, 3, 2), (5, 2, 1), (5, 1, None)} <= got

    docs = spark.createDataFrame([(10, [5]), (11, [3, 2]), (12, [999])],
                                 "doc_id long, taxids array<int>")
    out = expand_lineage(docs, closure)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["doc_id"]: r["_meta_lineage"] for r in out.collect()}
    assert [e["taxon"] for e in rows[10]] == [1, 2, 3, 4, 5]
    assert [e["taxon"] for e in rows[11]] == [1, 2, 3]
    assert rows[12] == []  # unknown taxid -> empty lineage


def test_uploader_plan_scans_independent_of_sources(spark):
    """The registry dispatch's scan count is bounded by the number of
    OPERATOR-STAGE KINDS (base + reclassify/lineage/drop-rule subsets),
    never by the number of registered sources: row-local stages
    (doi promote, placeholder, casefold) are when()-dispatched columns,
    and the funder lookup is a broadcast join on the main frame. A
    registry twice the size must produce the identical physical scan
    count (the round-2 design built a filter-union branch per source)."""
    import re

    from nde_crawlers_spark.queries import _uploader_fixture, _uploader_lookups
    from nde_crawlers_spark.uploaders import UPLOADERS, UploaderSpec, run_uploader

    docs = _uploader_fixture(spark, SF001)
    lookups = _uploader_lookups(spark)

    def n_scans(registry):
        out = run_uploader(docs, registry, **lookups)
        plan = out._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Scan parquet|FileScan parquet", plan))

    # base = the REAL 59-entry registry (every reference uploader chain)
    base = n_scans(UPLOADERS)
    doubled = dict(UPLOADERS)
    for i in range(60):  # +60 synthetic sources across every stage kind
        doubled[f"extra{i}"] = UploaderSpec(
            family="mixed",
            promote_doi=(i % 3 == 0),
            placeholder_fields=("author",) if i % 3 == 1 else (),
            reclassify=(i % 5 == 0),
            lineage=(i % 5 == 1),
            drop_rules=(i % 5 == 2),
            funding=(i % 5 == 3),
            pmid=(i % 7 == 0),
            measurement_technique=(i % 7 == 1),
            topic_category=(i % 7 == 2),
        )
    assert n_scans(doubled) == base
    # The absolute count is a CONSTANT of the stage vocabulary (each
    # operator stage re-reads its subset a bounded number of times:
    # reclassify = 2 posexplode sides + the ids frame, lineage = explode
    # + join-back, drop rules = 1, pmid = explode + regroup), never a
    # function of #sources.
    assert base <= 14


def test_uploader_registry_enrichment_chains(spark):
    """The REAL registry's stage kinds actually transform their rows:
    immport (standardize_data + standardize_funding + mt + topic) rows
    are reclassified + funder-enriched, every WRAPPED source carries
    lineage and a casefolded _id, node (load_pmid_ctfd +
    process_descriptions) rows gain citations and lose dropped NER
    entities, zenodo promotes DOIs, and empty-chain sources
    (workflowhub — no load_data of its own) still get the INHERITED
    wrapper tail (lineage + casefold, nde.py:119-127) with no
    pre-wrapper stage side effects."""
    from nde_crawlers_spark.queries import _uploader_fixture, _uploader_lookups
    from nde_crawlers_spark.uploaders import run_uploader

    docs = _uploader_fixture(spark, SF001)
    out = run_uploader(docs, **_uploader_lookups(spark)).cache()

    # immport: matched species standardized (taxon- name) + funder hit
    imm = out.filter(F.col("source") == "immport")
    std_names = imm.select(F.explode("species").alias("e")).select("e.name")
    assert std_names.filter(F.col("name").startswith("taxon-")).count() > 0
    assert imm.filter(F.col("funder_name").isNotNull()).count() > 0
    assert imm.filter(F.col("technique_std").isNotNull()).count() > 0
    assert imm.filter(F.col("topic").isNotNull()).count() > 0
    # every wrapped source carries lineage — including empty-chain
    # workflowhub, whose inherited base load_data is itself wrapped
    assert out.filter((F.col("source") == "immport") & (F.size("_meta_lineage") == 0)).count() == 0
    assert out.filter((F.col("source") == "workflowhub") & (F.size("_meta_lineage") == 0)).count() == 0
    # node (process_descriptions): rule-hit entities dropped; citations on
    nd = out.filter(F.col("source") == "node")
    assert nd.select(F.explode("ner").alias("e")).filter(F.col("e.name") == "china").count() == 0
    assert nd.filter(F.size("citations") > 0).count() > 0
    # immunespace (standardize_data only): NER untouched, no citations
    ims = out.filter(F.col("source") == "immunespace")
    assert ims.select(F.explode("ner").alias("e")).filter(F.col("e.name") == "china").count() > 0
    assert ims.filter(F.size("citations") > 0).count() == 0
    # zenodo: single valid DOI promoted into _id (then casefolded)
    zen = out.filter(F.col("source") == "zenodo")
    assert zen.filter(F.col("_id").startswith("10.")).count() > 0
    # empty-chain source: the inherited wrapper tail still casefolds _id
    wf = out.filter(F.col("source") == "workflowhub").select("_id").first()
    assert wf["_id"].startswith("workflowhub:rec:")
    out.unpersist()


def test_pipeline_e2e_no_extra_shuffles(spark):
    """The composed hub lifecycle (registry dispatch -> 1x1 key dedup ->
    directive application -> wrapper gate) stays ONE lazy plan whose
    shuffle count is bounded by the registry plan plus the merge stage's
    own budget (two key-dedup aggregations, the gain join, the loser
    anti-join) — composition must not multiply corpus shuffles. Catalyst
    also PRUNES unused stage joins (the pipeline output omits `ner`, so
    the drop-rules join disappears), which this guards too."""
    import re

    from nde_crawlers_spark.queries import QUERIES

    def counts(name):
        plan = QUERIES[name](spark, SF001)._jdf.queryExecution().executedPlan().toString()
        # \bExchange\b = SHUFFLE exchanges only: BroadcastExchange (a
        # dim-table ship, repeated wherever the plan tree embeds the
        # registry frame, deduped by ReuseExchange at runtime) is not a
        # corpus shuffle and scales with plan-tree size, not data
        # movement
        return (
            len(re.findall(r"\bExchange\b", plan)),
            len(re.findall(r"SortMergeJoin", plan)),
        )

    ex_reg, smj_reg = counts("uploader_registry")
    ex_pipe, smj_pipe = counts("nde_pipeline_e2e")
    assert ex_pipe <= ex_reg + 6
    assert smj_pipe <= smj_reg + 3


def _parse_reference_chains():
    """Derive every uploader's (wrapped, chain) by PARSING the reference
    uploader sources with ``ast`` — independent of the registry table,
    so a transcription error in ``uploaders._CHAINS`` fails the test.

    Rules (hub/dataload/nde.py):
    - a class with NO ``load_data`` inherits the base ``load_data``,
      which is itself decorated ``@nde_upload_wrapper``
      (NDESourceUploader nde.py:119-127, NDESourceSampleUploader
      nde.py:1407-1415, NDECombinedUploader nde.py:2237 extends
      NDESourceUploader) -> wrapped, empty chain;
    - a class WITH ``load_data`` is wrapped iff the method carries the
      ``@nde_upload_wrapper`` decorator;
    - the chain is the source-order sequence of stage-helper calls in
      the ``load_data`` body (load_pmid_ctfd / standardize_funding /
      standardize_data / process_descriptions /
      process_measurement_technique / add_topic_category /
      add_disambiguating_description)."""
    import ast
    from pathlib import Path

    src = Path("/root/reference/biothings-hub/files/nde-hub/hub/dataload/sources")
    stage_of = {
        "load_pmid_ctfd": "pmid",
        "standardize_funding": "fund",
        "standardize_data": "recl",
        "process_descriptions": "ner",
        "process_measurement_technique": "mt",
        "add_topic_category": "topic",
        "add_disambiguating_description": "disamb",
    }
    wrapped_bases = {"NDESourceUploader", "NDESourceSampleUploader", "NDECombinedUploader"}

    def base_name(b):
        return getattr(b, "id", None) or getattr(b, "attr", None)

    chains = {}
    for d in sorted(p for p in src.iterdir() if p.is_dir()):
        for up in sorted(d.glob("*uploader*.py")):
            # ncbi_geo ships two uploaders: gse_uploader.py, gsm_uploader.py
            key = d.name if up.name == "uploader.py" else f"{up.name.split('_')[0]}_{d.name}"
            tree = ast.parse(up.read_text())
            for node in tree.body:
                if not isinstance(node, ast.ClassDef):
                    continue
                if not any(str(base_name(b)).endswith("Uploader") for b in node.bases):
                    continue
                load = next(
                    (m for m in node.body
                     if isinstance(m, ast.FunctionDef) and m.name == "load_data"),
                    None,
                )
                if load is None:
                    bases = {base_name(b) for b in node.bases}
                    assert bases & wrapped_bases, f"{key}: no load_data, non-NDE base {bases}"
                    chains[key] = (True, "")
                    continue
                wrapped = any(
                    getattr(dec, "id", getattr(dec, "attr", None)) == "nde_upload_wrapper"
                    for dec in load.decorator_list
                )
                calls = sorted(
                    (
                        (c.lineno, c.col_offset, stage_of[fn])
                        for c in ast.walk(load)
                        if isinstance(c, ast.Call)
                        and (fn := getattr(c.func, "id", getattr(c.func, "attr", None)))
                        in stage_of
                    ),
                )
                chains[key] = (wrapped, " ".join(s for _, _, s in calls))
    return chains


def test_registry_matches_reference_chains():
    """Every one of the 59 reference uploader classes
    (hub/dataload/sources/** — 58 dirs, ncbi_geo ships gse+gsm) resolves
    to a spec whose stage set matches its load_data chain. The expected
    table is DERIVED by parsing the reference uploader sources
    (``_parse_reference_chains``), so any registry drift — wrong stage
    order, a missed wrapper decoration, a phantom source — fails here.
    Spot anchors: immport/uploader.py:23-31 (recl fund ner disamb mt
    topic, wrapped), zenodo/uploader.py:27-111 (sqlite version merge + DOI
    promotion, wrapped, no pre-wrapper stages), workflowhub/uploader.py
    (no load_data of its own -> inherits the WRAPPED base load_data,
    nde.py:119-127), node/uploader.py:15-21
    (pmid fund recl ner mt topic)."""
    from nde_crawlers_spark.uploaders import _CHAINS, UPLOADERS

    expected = _parse_reference_chains()
    assert _CHAINS == expected
    assert len(UPLOADERS) == 59
    # ALL 59 are wrapped: the six classes without their own load_data
    # (bioconductor, dockstore, gxa, sb_apps, veupath_collections,
    # workflowhub) inherit the base load_data, itself @nde_upload_wrapper
    assert sum(1 for _, (w, _c) in expected.items() if w) == 59
    for name, (wrapped, chain) in expected.items():
        sp = UPLOADERS[name]
        s = set(chain.split())
        # per-source pre-wrapper stage flags
        assert sp.pmid == ("pmid" in s), name
        assert sp.funding == ("fund" in s), name
        assert sp.reclassify == ("recl" in s), name
        assert sp.drop_rules == ("ner" in s), name
        assert sp.measurement_technique == ("mt" in s), name
        assert sp.topic_category == ("topic" in s), name
        assert sp.disambiguate == ("disamb" in s), name
        # add_disambiguating_description ships in exactly two chains
        # (immport/uploader.py:27, clinepidb/uploader.py:33)
        assert sp.disambiguate == (name in ("immport", "clinepidb")), name
        assert sp.stages == tuple(chain.split()), name
        # wrapper tail (utils/utils.py:352-403) is all-or-nothing
        assert sp.lineage == wrapped, name
        assert sp.casefold_id == wrapped, name
        assert (sp.placeholder_fields == ("author",)) == wrapped, name
        # zenodo's sqlite version merge + DOI promotion
        assert sp.promote_doi == (name == "zenodo"), name


def test_prefix_scan_predicate_pushdown(spark):
    """S17: a prefix/equality predicate over the documents table must
    reach the parquet scan as PushedFilters with a pruned ReadSchema —
    the difference between scanning 2 columns of matching row groups
    and scanning everything at 100 TB."""
    import re

    df = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .filter(F.col("source") == "src3")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "source")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    assert "EqualTo(source,src3)" in pushed and "LessThan(doc_id,100)" in pushed
    rs = re.search(r"ReadSchema: (\S+)", plan)
    assert rs and set(re.findall(r"(\w+):", rs.group(1))) <= {"struct", "doc_id", "source"}
