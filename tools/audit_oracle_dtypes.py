"""Audit DuckDB oracle twins for HUGEINT (int128) output columns.

DuckDB's SUM() over integer columns returns HUGEINT, which pandas
materializes as float/object and the driver's hash canonicalization
then mismatches against Spark's BIGINT. Every integer aggregate in
ORACLE_QUERIES must be wrapped in CAST(... AS BIGINT).

Usage: python tools/audit_oracle_dtypes.py [sf_dir]
Prints each query emitting >=1 HUGEINT/UHUGEINT column; exit 1 if any.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BAD = ("HUGEINT", "UHUGEINT", "INT128", "UINT128")


def hugeint_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    out = []
    for r in rows:
        name, dtype = r[0], str(r[1]).upper()
        if any(b in dtype for b in BAD):
            out.append((name, dtype))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from clickhouse_forecasting_spark.queries import ORACLE_QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    offenders: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in ORACLE_QUERIES.items():
        try:
            cols = hugeint_columns(con, sql)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:200]
            continue
        if cols:
            offenders[name] = cols

    for name, cols in sorted(offenders.items()):
        print(f"HUGEINT {name}: {cols}")
    for name, err in sorted(errors.items()):
        print(f"ERR     {name}: {err}")
    print(f"\n{len(offenders)} queries with HUGEINT columns, {len(errors)} describe errors, "
          f"{len(ORACLE_QUERIES)} total oracles")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
