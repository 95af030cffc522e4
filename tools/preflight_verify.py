#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate.

Reads a Verify dump (outDir with one parquet dir per query +
oracle_sql.json), replays each oracle SQL in DuckDB over the same
testdata tables, and compares rows/schema/values the way the driver
does (columns sorted by name, rows sorted, doubles compared to 1e-9
relative). Usage:

    python3 tools/preflight_verify.py /root/testdata/sf0.01 /tmp/verify_r6
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(rows):
    return sorted([tuple(str(norm(v)) for v in r) for r in rows])


def close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        return False


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad, ok, skipped = [], 0, 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            # quote: result columns may be reserved words (e.g. `column`)
            spark_rows = con.sql(
                f"SELECT {', '.join(chr(34) + c + chr(34) for c in spark_cols)}"
                " FROM spark_rel").fetchall()
        except Exception as e:
            bad.append((name, f"spark read failed: {e}"))
            continue
        try:
            o_rel = con.sql(sql)
            o_cols = sorted(o_rel.columns)
            o_rows = con.sql(
                f"SELECT {', '.join(chr(34) + c + chr(34) for c in o_cols)}"
                " FROM o_rel").fetchall()
        except Exception as e:
            bad.append((name, f"oracle failed: {e}"))
            continue
        if spark_cols != o_cols:
            bad.append((name, f"schema: spark={spark_cols} oracle={o_cols}"))
            continue
        if len(spark_rows) != len(o_rows):
            bad.append((name, f"rows: spark={len(spark_rows)} oracle={len(o_rows)}"))
            continue
        s_sorted = sorted(spark_rows, key=lambda r: tuple(str(norm(v)) for v in r))
        o_sorted = sorted(o_rows, key=lambda r: tuple(str(norm(v)) for v in r))
        mismatch = None
        for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
            for j, (sv, ov) in enumerate(zip(sr, orow)):
                if not close(sv, ov):
                    mismatch = f"row {i} col {spark_cols[j]}: spark={sv!r} oracle={ov!r}"
                    break
            if mismatch:
                break
        if mismatch:
            bad.append((name, mismatch))
        else:
            ok += 1
    print(f"OK={ok} BAD={len(bad)}")
    for name, why in bad:
        print(f"  FAIL {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
