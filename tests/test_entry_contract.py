"""Driver-contract conformance: entry/queries/oracle_sql, verified locally
exactly the way the driver does (Spark vs DuckDB, order-insensitive)."""

import pytest

import __spark_entry__ as entry_mod
from tuatara_spark import verifier

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"doc_id", "text"}
    assert any(r.text for r in rows)  # extraction produced real text


def test_contract_shapes(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15


@pytest.mark.parametrize("name", sorted(verifier.REGISTRY))
def test_query_matches_oracle(spark, name):
    r = verifier.compare_query(spark, name, SF)
    assert r["match"], r
    assert r["rows"] > 0
