#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs Oracles (DuckDB), mimicking
the driver's compare: for each query, read the Spark parquet dump, run the
oracle SQL in DuckDB over the same sf dir, sort columns by name, and compare
row counts, schemas (loosely), and values (exact for non-floats, tolerance
report for floats so we can see WHERE a hash-compare would break).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import json
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        import pyarrow as pa
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        n_spark = spark_tbl.num_rows
        if name not in oracles:
            results[name] = f"ROWS_ONLY n={n_spark}" + (" EMPTY!" if n_spark == 0 else "")
            continue
        try:
            oracle = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        # sort columns by name (driver behavior)
        s_cols = sorted(spark_tbl.column_names)
        o_cols = sorted(oracle.column_names)
        if s_cols != o_cols:
            results[name] = f"COLUMN_MISMATCH spark={s_cols} oracle={o_cols}"
            continue
        if n_spark != oracle.num_rows:
            results[name] = f"ROWCOUNT spark={n_spark} oracle={oracle.num_rows}"
            continue
        spark_rows = spark_tbl.select(s_cols).to_pylist()
        oracle_rows = oracle.select(o_cols).to_pylist()
        mismatches = []
        float_close = 0
        for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
            for c in s_cols:
                va, vb = a[c], b[c]
                if va is None and vb is None:
                    continue
                if va is None or vb is None:
                    mismatches.append((i, c, va, vb)); continue
                if isinstance(va, float) and isinstance(vb, float):
                    if va == vb or (math.isnan(va) and math.isnan(vb)):
                        continue
                    if abs(va - vb) < 1e-9 * max(1.0, abs(va)):
                        float_close += 1; mismatches.append((i, c, va, vb))
                    else:
                        mismatches.append((i, c, va, vb))
                elif str(va) != str(vb):
                    mismatches.append((i, c, va, vb))
            if len(mismatches) > 5:
                break
        if not mismatches:
            # schema check (loose: arrow types should be equal)
            s_schema = {f.name: str(f.type) for f in spark_tbl.schema}
            o_schema = {f.name: str(f.type) for f in oracle.schema}
            diffs = {c: (s_schema[c], o_schema[c]) for c in s_cols if s_schema[c] != o_schema[c]}
            if diffs:
                # arrow-type diffs diverge the driver's typed hash even when
                # values are bit-exact (e.g. DuckDB sum(BIGINT) -> HUGEINT
                # vs Spark int64) -- treat as failure, not green.
                results[name] = f"SCHEMA_DIFF n={n_spark} {diffs}"
            else:
                results[name] = f"OK n={n_spark}"
        else:
            results[name] = f"VALUE_MISMATCH ({len(mismatches)} shown, float_close={float_close}): {mismatches[:4]}"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
    print(f"\n{n_ok}/{len(results)} green")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
