"""Driver-shaped parity gate: every registered query with an oracle must
hash-match DuckDB on the same parquet (SURVEY.md §5.2 item 1).

Runs at sf0.001 for speed (the driver runs sf0.01); a marker-selected
slow variant covers sf0.01.
"""

from __future__ import annotations

import pytest

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_SMALL, compare_query_to_oracle

_ensure_loaded()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    ok, msg = compare_query_to_oracle(spark, SF_SMALL, name, spec.fn, spec.oracle)
    assert ok, msg


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still run and return a stable schema."""
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMALL)
    assert df.columns, name
    assert df.count() >= 0
