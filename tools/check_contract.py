"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet dir, comparing row count, column-name
schema, and an order-insensitive value hash (columns sorted by name,
rows sorted, values canonicalized). Usage::

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, decimal.Decimal):
        return _canon(float(v))
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, (datetime.datetime,)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode("utf-8")).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    import __spark_entry__ as entrymod
    from med_doi_feature_extraction_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Vacuous-pass guards: a typo'd sf_dir or query name must be a
    # loud error, never a silent "all queries match" over zero rows.
    if not Path(sf_dir).is_dir():
        print(f"error: sf_dir {sf_dir!r} is not a directory "
              "(usage: check_contract.py [SF_DIR] [QUERY ...])")
        return 2
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"error: unknown query names: {sorted(unknown)}")
        return 2

    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {exc}")
            failures.append(name)
            continue
        sh, sn = frame_hash(scols, [tuple(r) for r in srows])
        oh, on = frame_hash(ocols, orows)
        schema_ok = sorted(scols) == sorted(ocols)
        ok = schema_ok and sn == on and sh == oh
        status = "OK " if ok else "FAIL"
        schema_note = "=" if schema_ok else f"{sorted(scols)} != {sorted(ocols)}"
        print(
            f"{name:24s} {status} rows {sn}/{on} schema {schema_note} hash {sh}/{oh}"
        )
        if not ok:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
