#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the parquet results that graft.Verify dumped to OUT_DIR, runs each
oracle_sql.json query in DuckDB against the same sf parquet tables, and
compares row-by-row (columns sorted by name, doubles to 4dp, timestamps as
strings). Dev-only tool — the Scala library has no python dependency.

Usage: python3 scripts/selfcheck.py [sf_dir] [out_dir] [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 canonicalizes -0.0: repr('-0.0') sorts differently from
        # repr('0.0') and would misalign the sorted row lists even though
        # the values compare equal (bit q63 at sf0.1)
        return round(v, 4) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # Compare as a multiset (sorted row list): every query carries a total
    # ORDER BY, so sorted comparison is equivalent and does not depend on
    # parquet part-file glob order.
    return sorted((tuple(norm(r[i]) for i in order) for r in data), key=repr)


def main():
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; StressGen writes Spark-style
        # directories — glob the latter
        p = Path(f"{SF_DIR}/{t}.parquet")
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        sel = "SELECT *"
        if t == "events":
            # the source parquet's TIMESTAMP(NANOS) becomes a BIGINT when
            # Spark rewrites it (nanosAsLong is read-only), e.g. in the
            # StressGen sf~1 set; reconstruct the micros-TIMESTAMP DuckDB
            # would have read (its nanos read floor-truncates to micros,
            # exactly ts // 1000)
            ty = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{src}') LIMIT 1"
            ).fetchone()[0]
            if ty == "BIGINT":
                sel = ("SELECT * REPLACE (('1970-01-01'::TIMESTAMP"
                       " + to_microseconds(ts // 1000)) AS ts)")
        con.execute(
            f"CREATE VIEW {t} AS {sel} FROM read_parquet('{src}')")
    oracle = json.loads(Path(f"{OUT_DIR}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if ONLY and name not in ONLY:
            continue
        sql = oracle[name]
        res_dir = Path(OUT_DIR) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            # Guard against oracle output types the driver's hasher may
            # represent differently than Spark's parquet (e.g. HUGEINT from
            # SUM over integers — caused the round-2 q23/q42 hash mismatch).
            typ_rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            exotic = [(c, str(t)) for c, t in zip(typ_rel.columns, typ_rel.types)
                      if str(t) not in ("BIGINT", "INTEGER", "DOUBLE", "VARCHAR")]
            if exotic:
                print(f"WARN {name}: exotic oracle output types {exotic}")
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [c[0] for c in got_rel.description]
            got = rows_of(got_cols, got_rel.fetchall())
            exp_rel = con.execute(sql)
            exp_cols = [c[0] for c in exp_rel.description]
            exp = rows_of(exp_cols, exp_rel.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_fail += 1
            continue
        if got == exp:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            shown = 0
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  row {i}: spark={g}\n          duck ={e}")
                    shown += 1
                    if shown >= 3:
                        break
            if len(got) != len(exp) and shown == 0:
                print(f"  first extra: "
                      f"{got[len(exp)] if len(got) > len(exp) else exp[len(got)]}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
