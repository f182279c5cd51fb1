#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run each
oracleSql in DuckDB over the same parquet tables and compare against the
Verify.scala parquet dumps (exact compare, columns sorted by name).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

NOT part of the engine — the shipped library is pure Scala/Spark.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    # decimals -> float, timestamps -> isoformat at us precision
    t = type(v).__name__
    if t == "Decimal":
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm_cell(col[i]) for col in data) for i in range(tbl.num_rows)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            failures.append((name, "spark output missing"))
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            n_fail += 1
            continue
        spark = pq.read_table(spark_path)
        dc, drows = table_rows(duck)
        sc, srows = table_rows(spark)
        if dc != sc:
            failures.append((name, f"schema mismatch: duck={dc} spark={sc}"))
            n_fail += 1
            continue
        # type drift is a FAILURE: the driver's hash compare is
        # type-sensitive, so value-equal but differently-typed columns
        # (e.g. DECIMAL(38,0) vs BIGINT) are driver-red even when the
        # normalized cells below compare equal. A WARN here was the root
        # cause of q300/q302 being builder-green and driver-red for two
        # rounds. Exception: timestamp UNIT drift (DuckDB reads
        # parquet ts as [us], Spark writes [ns] under nanosAsLong
        # round-trips) — the driver normalizes timestamps before
        # hashing; every [us]/[ns]-only query is driver-hash-green
        # (q24/q29/q30/q31/q63/q74/q75/q100/q254 in CORRECTNESS_r12).
        def ts_unit_only(a, b):
            pa, pb = a.split(",", 1), b.split(",", 1)
            tz_a = pa[1] if len(pa) > 1 else ""
            tz_b = pb[1] if len(pb) > 1 else ""
            return (a.startswith("timestamp[") and b.startswith("timestamp[")
                    and tz_a == tz_b)
        dtypes = {f.name: str(f.type) for f in duck.schema}
        stypes = {f.name: str(f.type) for f in spark.schema}
        drift = {c: (dtypes[c], stypes[c]) for c in dtypes
                 if dtypes[c] != stypes[c]
                 and not ts_unit_only(dtypes[c], stypes[c])}
        if drift:
            failures.append((name, f"type drift (duck, spark): {drift}"))
            n_fail += 1
            continue
        if drows != srows:
            msg = f"rows differ: duck={len(drows)} spark={len(srows)}"
            for i, (a, b) in enumerate(zip(drows, srows)):
                if a != b:
                    msg += f"\n  first diff at row {i}:\n    duck : {a}\n    spark: {b}"
                    break
            failures.append((name, msg))
            n_fail += 1
            continue
        n_pass += 1
        print(f"PASS {name} ({len(srows)} rows)")

    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
