#!/usr/bin/env python3
"""Snapshot gate: assert the query catalog is fully verifiable BEFORE any
end-of-round commit. Runs off an existing `graft.Verify` dump (no JVM start),
so it is cheap enough for the final minutes of a round.

Checks, in order of the defect classes that actually shipped:
 1. every `SparkEntry.queries` entry has a `SparkEntry.oracleSql` entry and
    vice versa (rounds 4 AND 5 shipped unoracled catalog entries);
 2. no query threw during the dump (round 7's q_w14/q_w12/q_ea_funnel broke
    silently when testdata changed ts types — a throwing query leaves no
    parquet and vanishes from the driver's compare);
 3. every dump directory is non-empty (rows > 0 — the driver smoke rule).

Usage: python3 tools/check_entries.py <verifyOutDir>
Exit 0 = safe to commit; exit 1 = the commit would ship a red round.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq


def main(out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_keys = set(json.load(f))
    cat_path = os.path.join(out_dir, "catalog.json")
    if not os.path.exists(cat_path):
        print("FAIL: catalog.json missing — re-run graft.Verify (old build?)")
        return 1
    with open(cat_path) as f:
        cat = json.load(f)
    queries, failed = set(cat["queries"]), set(cat["failed"])

    rc = 0
    unoracled = queries - oracle_keys
    if unoracled:
        print(f"FAIL: catalog entries with NO oracleSql: {sorted(unoracled)}")
        rc = 1
    orphaned = oracle_keys - queries
    if orphaned:
        print(f"FAIL: oracleSql entries with NO catalog query: {sorted(orphaned)}")
        rc = 1
    if failed:
        print(f"FAIL: queries THREW during the Verify dump: {sorted(failed)}")
        rc = 1

    for name in sorted(queries - failed):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL: {name}: no parquet output")
            rc = 1
            continue
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        if rows == 0:
            print(f"FAIL: {name}: 0 rows (driver smoke rule is rows > 0)")
            rc = 1

    if rc == 0:
        print(f"OK: {len(queries)} catalog entries, all oracled, "
              "all dumped, all non-empty")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
