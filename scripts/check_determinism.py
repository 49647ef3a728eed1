#!/usr/bin/env python3
"""Determinism sweep: compare two independent graft.Verify runs —
every query's result must be value-identical run-to-run (the engine-wide
determinism mandate; catches rand()/time()/unordered-collect misuse).

Usage: python3 scripts/check_determinism.py <outDirA> <outDirB>
"""
import os
import sys

import duckdb


def main(a, b):
    con = duckdb.connect()
    # enumerate result DIRECTORIES, not oracle keys — oracle-free queries
    # (sketches, nested envelopes) have no other cross-check, so the
    # determinism sweep must cover them too
    names = sorted(d.name for d in os.scandir(a) if d.is_dir())
    names_b = {d.name for d in os.scandir(b) if d.is_dir()}
    if set(names) != names_b:
        print(f"FAIL: run outputs differ: {set(names) ^ names_b}")
        return 1
    n_fail = 0
    for name in names:
        try:
            ra = con.execute(f"SELECT * FROM '{a}/{name}/*.parquet'").fetchall()
            rb = con.execute(f"SELECT * FROM '{b}/{name}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(map(repr, ra)) != sorted(map(repr, rb)):
            print(f"FAIL {name}: runs differ")
            n_fail += 1
        else:
            print(f"PASS {name}")
    print(f"== determinism: {len(names) - n_fail} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
