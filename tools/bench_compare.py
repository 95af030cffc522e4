#!/usr/bin/env python3
"""Round-over-round bench comparison on the COMMON query subset.

Usage: python3 tools/bench_compare.py BENCH_local_r8.json BENCH_local_r10.json [threshold]

Reads the one-line full bench JSON (or a file whose last JSON-looking
line parses), joins per-query warm medians on the common subset, and
prints every entry whose ratio exceeds the threshold (default 1.5x) in
either direction plus the subset totals. This is the instrument that
separates box noise (uniform drift) from a real regression (one entry
moving alone) — the comparison that caught r7's g_clustering.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no parseable JSON line in {path}")


def queries(doc):
    out = {}
    out.update(doc.get("queries", {}))
    out.update(doc.get("extended", {}))
    return out


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = queries(a), queries(b)
    common = sorted(set(qa) & set(qb))
    only_b = sorted(set(qb) - set(qa))
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(f"common subset: {len(common)} queries; "
          f"totals {ta:.1f}s -> {tb:.1f}s ({tb / max(ta, 1e-9):.2f}x)")
    flagged = []
    for k in common:
        r = qb[k] / max(qa[k], 1e-9)
        if r > thresh or r < 1 / thresh:
            flagged.append((r, k, qa[k], qb[k]))
    for r, k, va, vb in sorted(flagged, reverse=True):
        print(f"  {k:28s} {va:8.3f}s -> {vb:8.3f}s  {r:5.2f}x")
    if not flagged:
        print(f"  no entry moved more than {thresh}x in either direction")
    if only_b:
        print(f"new-in-B ({len(only_b)}): " + ", ".join(
            f"{k}={qb[k]:.2f}s" for k in only_b))
    sa, sb = (d.get("streaming", {}).get("events_per_sec", {}) for d in (a, b))
    for k in sorted(set(sa) & set(sb)):
        print(f"  stream {k:22s} {sa[k]:10,.0f} -> {sb[k]:10,.0f} ev/s "
              f"({sb[k] / max(sa[k], 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
