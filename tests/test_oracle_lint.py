"""Lint every oracle_sql() twin for the DuckDB HUGEINT pitfall.

DuckDB's ``sum()`` over BIGINT returns HUGEINT (int128), which pandas
materializes as float64/object while Spark returns int64 — the driver's
value-hash then mismatches even when values are identical (this was
CORRECTNESS_r04's only red row, ``ftse_hits_histogram``).  Rather than
regex-scanning the SQL text, we let DuckDB *plan* each oracle against the
sf0.001 tables and assert no HUGEINT/UHUGEINT column survives to the final
projection.  Planning is lazy, so this lints all ~170 oracles in seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = Path("/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED_TYPES = {"HUGEINT", "UHUGEINT"}


def _oracle_items():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    if not SF_DIR.exists():
        pytest.skip("testdata sf0.001 not present")
    c = duckdb.connect()
    for t in TABLES:
        p = SF_DIR / f"{t}.parquet"
        if p.exists():
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return c


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=lambda v: v if isinstance(v, str) and "\n" not in v else "")
def test_oracle_output_has_no_hugeint(con, name, sql):
    rel = con.sql(sql)  # lazy: plans + infers types, does not execute
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in BANNED_TYPES
    ]
    assert not bad, (
        f"oracle {name!r} emits {bad}: wrap the aggregate in "
        f"CAST(... AS BIGINT) so pandas/Spark dtypes agree"
    )
