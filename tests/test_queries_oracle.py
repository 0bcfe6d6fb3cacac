"""The local t2 gate: every registered query must hash-match its DuckDB oracle
(or produce rows, for rows-only specs) before it may be declared in
``__spark_entry__.py``. Parametrized over the full registry."""

from __future__ import annotations

import pytest

from bee_proof_spark.queries import load_all
from bee_proof_spark.testing import compare_to_oracle

REGISTRY = load_all()


@pytest.mark.parametrize("qid", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_oracle, qid):
    spec = REGISTRY[qid]
    ok, msg = compare_to_oracle(spark, spec, sf_oracle)
    assert ok, msg


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_contract_consistency():
    """oracle_sql() keys must be a subset of queries() keys."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)
