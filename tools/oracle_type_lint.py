"""Oracle type-portability lint: DESCRIBE every ``oracle_sql()``
statement in DuckDB and fail on any output column typed HUGEINT /
DECIMAL / INT128.

Why this exists: DuckDB types an uncast ``sum()`` over integers as
HUGEINT and decimal literals as DECIMAL(p,s), and that typing has
CHANGED across DuckDB releases — so a query can hash-match the local
checker yet hash-mismatch the driver's (round-4 postmortem:
change_rate / funnel_summary / cdc_dedup / leakage_audit were red at
the driver for exactly this, green locally). Spark never produces
those types, so any such output column is a portability bug by
construction: wrap it ``CAST(... AS BIGINT)`` (counts) or
``CAST(round(..., 6) AS DOUBLE)`` (rates).

Planning-only (no query execution), so the full 163-oracle sweep runs
in seconds. Exit code 0/1 — run it next to check_contract and
plan_lint in the end-of-session loop and assert the EXIT CODE (a
``| tail`` pipeline eats it).
"""

from __future__ import annotations

import importlib.util
import os
import sys

BAD_TYPES = ("HUGEINT", "DECIMAL", "INT128")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    oracles = mod.oracle_sql()
    only = set(sys.argv[1:])
    bad: dict[str, list[tuple[str, str]]] = {}
    errs: dict[str, str] = {}
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report, don't crash
            errs[name] = str(e).splitlines()[0][:160]
            continue
        flags = [
            (c[0], c[1])
            for c in cols
            if any(k in c[1].upper() for k in BAD_TYPES)
        ]
        if flags:
            bad[name] = flags

    print(f"oracle_type_lint: {len(oracles)} oracles checked (sf={sf})")
    for n, f in sorted(bad.items()):
        print(f"  TYPE  {n}: {f}")
    for n, e in sorted(errs.items()):
        print(f"  ERROR {n}: {e}")
    if bad or errs:
        print(f"FAIL: {len(bad)} type-unstable, {len(errs)} errors")
        return 1
    print("OK: no HUGEINT/DECIMAL outputs, all oracles DESCRIBE clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
