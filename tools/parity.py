"""Local oracle-parity harness — mimics the driver's CORRECTNESS check.

Runs every ``queries()`` entry at a given sf_dir via Spark AND the
matching ``oracle_sql()`` via DuckDB, then compares:
  * row count
  * column names (sorted)
  * order-insensitive value hash (rows sorted, values canonicalized)

Usage:  python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for row in canon_rows:
        h.update(row.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def run(sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    import __spark_entry__ as entrymod
    from fusus_spark.session import get_spark
    from fusus_spark.sources.testdata import TABLES

    spark = get_spark("parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            results[name] = {"ok": False, "error": f"spark: {type(exc).__name__}: {exc}"}
            print(f"FAIL {name}: spark error: {exc}")
            continue
        rec = {
            "rows": len(srows),
            "cols": sorted(scols),
            "spark_s": round(time.time() - t0, 2),
        }
        if name not in oracles:
            rec.update({"ok": len(srows) >= 0, "mode": "rows-only"})
            print(f"ok   {name}: rows-only, {len(srows)} rows ({rec['spark_s']}s)")
            results[name] = rec
            continue
        try:
            orc = con.sql(oracles[name])
            ocols = orc.columns
            orows = [tuple(r) for r in orc.fetchall()]
        except Exception as exc:
            rec.update({"ok": False, "error": f"duckdb: {exc}"})
            print(f"FAIL {name}: duckdb error: {exc}")
            results[name] = rec
            continue
        count_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            value_hash(scols, srows) == value_hash(ocols, orows)
            if count_ok and schema_ok
            else False
        )
        rec.update(
            {
                "ok": count_ok and schema_ok and hash_ok,
                "oracle_rows": len(orows),
                "count_ok": count_ok,
                "schema_ok": schema_ok,
                "hash_ok": hash_ok,
            }
        )
        results[name] = rec
        status = "ok  " if rec["ok"] else "FAIL"
        print(
            f"{status} {name}: spark={len(srows)} oracle={len(orows)} "
            f"schema={schema_ok} hash={hash_ok} ({rec['spark_s']}s)"
        )
        if not rec["ok"] and count_ok and schema_ok:
            # show a few differing rows for debugging
            sset = {tuple(_canon(v) for v in r) for r in srows}
            oset = {tuple(_canon(v) for v in r) for r in orows}
            print("  spark-only:", list(sset - oset)[:3])
            print("  oracle-only:", list(oset - sset)[:3])
        elif not schema_ok:
            print(f"  spark cols:  {sorted(scols)}")
            print(f"  oracle cols: {sorted(ocols)}")
    spark.stop()
    return results


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    res = run(sf_dir, only)
    bad = [k for k, v in res.items() if not v.get("ok")]
    print(f"\n{len(res) - len(bad)}/{len(res)} queries match", end="")
    print(f"; FAILING: {bad}" if bad else "")
    sys.exit(1 if bad else 0)
