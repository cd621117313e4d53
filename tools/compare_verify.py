#!/usr/bin/env python3
"""Compare two graft.Verify output dirs (before/after an optimization):
every query's parquet must match in schema and multiset of rows.

Usage: python3 tools/compare_verify.py <before_dir> <after_dir> [query ...]
"""
import sys
import glob
import os

import duckdb


def main() -> int:
    before, after = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(
        d for d in os.listdir(before)
        if os.path.isdir(os.path.join(before, d)) and (not only or d in only))
    con = duckdb.connect()
    bad = []
    for n in names:
        bdir = os.path.join(before, n)
        adir = os.path.join(after, n)
        if not os.path.isdir(adir):
            bad.append((n, "missing in after"))
            continue
        bfiles = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
        afiles = sorted(glob.glob(os.path.join(adir, "*.parquet")))
        if not bfiles or not afiles:
            bad.append((n, f"no parquet (before={len(bfiles)}, after={len(afiles)})"))
            continue
        bs = con.execute(f"DESCRIBE SELECT * FROM read_parquet({bfiles!r})").fetchall()
        as_ = con.execute(f"DESCRIBE SELECT * FROM read_parquet({afiles!r})").fetchall()
        if bs != as_:
            bad.append((n, f"schema diff: {bs} vs {as_}"))
            continue
        # multiset equality via EXCEPT ALL both ways (NULL-safe in duckdb)
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet({bfiles!r}) "
            f"EXCEPT ALL SELECT * FROM read_parquet({afiles!r}))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet({afiles!r}) "
            f"EXCEPT ALL SELECT * FROM read_parquet({bfiles!r}))").fetchone()[0]
        if d1 or d2:
            bad.append((n, f"row diff: {d1} only-before, {d2} only-after"))
    extra = [d for d in os.listdir(after)
             if os.path.isdir(os.path.join(after, d)) and d not in set(names) and not only]
    print(f"compared {len(names)} queries: {len(names) - len(bad)} identical, {len(bad)} DIFFER"
          + (f", {len(extra)} extra-in-after: {extra}" if extra else ""))
    for n, why in bad:
        print(f"  DIFF {n}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
