"""Mirror of the driver's correctness gate: every catalog query vs its
DuckDB oracle at sf0.01."""

from __future__ import annotations

from nde_crawlers_spark.parity import run_parity

from .conftest import SF01


def test_all_queries_match_oracle(spark):
    res = run_parity(spark, SF01)
    bad = {k: v for k, v in res.items() if v != "ok" and not v.startswith("no-oracle")}
    assert not bad, bad
    assert len(res) >= 30
