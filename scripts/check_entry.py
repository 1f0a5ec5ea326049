"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB over the same sf dir; compare row count, column names, and
order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        key = tuple(sorted(r))
        out.append(tuple(_norm_val(r[k]) for k in key))
    return sorted(out, key=repr)


def _norm_val(v):
    import datetime
    import math

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None  # pandas NULL-for-object → NaN
        return round(v, 9)
    if isinstance(v, (datetime.datetime, pd.Timestamp)):
        return v.replace(tzinfo=None).isoformat()
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod
    from fulltextsearchengine_spark.session import get_spark

    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if prefix and not name.startswith(prefix):
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        drows = ddf.to_dict("records")
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            continue
        sn, dn = normalize(srows), normalize(drows)
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            failures.append(name)
            continue
        print(f"OK   {name}: rows={len(srows)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
