#!/usr/bin/env python3
"""Zipf-skewed stress-data generator (driver-side tool, not engine code).

The canonical testdata under /root/testdata is UNIFORM — every key has
about the same row count — so the skew paths (t_salted_agg,
t_salted_join, AQE skew-join) never face real skew there. This tool
writes a lineitem-shaped parquet whose join key follows a Zipf(s)
distribution, for ad-hoc local stress runs:

    python3 tools/gen_zipf.py --rows 2000000 --keys 200 --exponent 1.2 \
        --out /tmp/zipf/lineitem.parquet

The hottest key then holds ~1/H(keys,s) of ALL rows (28%+ at the
defaults) — pointing an unsalted shuffle join at it concentrates that
fraction on one reducer; the salted plan splits it across SALTS
reducers. The Scala-side equivalent distribution (same inverse-CDF
construction) backs the Round8Spec per-reducer bound, which is the
CI-enforced contract; this script exists to reproduce the skew at
arbitrary scale outside the test JVM.

Deterministic: row i's key comes from the inverse CDF at u=(i+0.5)/n
after a fixed-key hash shuffle — same rows for the same arguments.
"""
import argparse
import bisect
import os


def zipf_cdf(n_keys: int, s: float):
    weights = [1.0 / (r ** s) for r in range(1, n_keys + 1)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w
        cum.append(acc / total)
    return cum


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=200, help="distinct join keys")
    ap.add_argument("--exponent", type=float, default=1.2, help="Zipf exponent s")
    ap.add_argument("--out", required=True, help="output parquet path")
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    cum = zipf_cdf(args.keys, args.exponent)
    n = args.rows
    # fixed-multiplier hash spreads hot-key rows across the file so a
    # parquet row-group scan sees the same mix an executor would
    ids = [(i * 2654435761) % n for i in range(n)]
    keys = [bisect.bisect_left(cum, (i + 0.5) / n) for i in ids]
    table = pa.table({
        "l_orderkey": pa.array(range(n), type=pa.int64()),
        "l_partkey": pa.array(keys, type=pa.int64()),
        "l_linenumber": pa.array([i % 7 + 1 for i in range(n)], type=pa.int32()),
        "l_quantity": pa.array([float(k % 50 + 1) for k in ids], type=pa.float64()),
    })
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    pq.write_table(table, args.out)
    hot = keys.count(0)
    print(f"wrote {n} rows, {args.keys} keys, hottest key holds {hot} rows "
          f"({100.0 * hot / n:.1f}%) -> {args.out}")


if __name__ == "__main__":
    main()
