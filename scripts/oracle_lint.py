"""Oracle representation lint (VERDICT r7 item 2).

The driver hashes canonical VALUES of both frames, and DuckDB type
widening can change the canonical rendering without changing the
math: `sum(BIGINT)` widens to HUGEINT, which pandas materializes as
float (`1234567.0`) while Spark emits int64 (`1234567`) — a
guaranteed hash mismatch that `check_dtype=False` comparison is
blind to (this was w5's red row in r6 AND r7).  Same class:
UHUGEINT, and DECIMAL literals (`1.0 ELSE 0.0` → DECIMAL(2,1)).

This lint DESCRIBEs every oracle against the sf-dir views (no data
scanned — DuckDB binds types from parquet metadata) and fails on any
HUGEINT / UHUGEINT / DECIMAL output column.  It also REPORTS (without
failing) DATE-typed oracle columns, so a DATE-vs-TIMESTAMP tolerance
is declared, not lucky.

Run:  python scripts/oracle_lint.py [sf_dir]
Exit 0 iff no banned output types anywhere in the registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint(sf_dir: str = "/root/testdata/sf0.01") -> tuple[list, list]:
    """Return (banned_hits, date_cols); each item (query, col, type)."""
    import duckdb

    from stampede_to_fresco_etl_spark.catalog import REGISTRY, TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    banned, dates = [], []
    for name in sorted(REGISTRY):
        _fn, sql = REGISTRY[name]
        if sql is None:
            continue
        for col, typ, *_ in con.sql(f"DESCRIBE {sql}").fetchall():
            u = typ.upper()
            if any(b in u for b in BANNED):
                banned.append((name, col, typ))
            elif u == "DATE":
                dates.append((name, col, typ))
    return banned, dates


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    banned, dates = lint(sf_dir)
    for name, col, typ in dates:
        print(f"NOTE {name}.{col}: DATE (tolerated, declared)")
    for name, col, typ in banned:
        print(f"BANNED {name}.{col}: {typ}")
    print(f"LINT: {len(banned)} banned output columns, "
          f"{len(dates)} DATE columns noted")
    return 0 if not banned else 1


if __name__ == "__main__":
    raise SystemExit(main())
