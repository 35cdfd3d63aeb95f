#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark result) and runs
<outDir>/oracle_sql.json[name] in DuckDB with views named after the
testdata tables; compares values with columns sorted by name.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def norm_rows(cols, types, rows, sort_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    if sort_rows:
        out.sort()
    # column types travel with the sorted columns: the driver's gate
    # hashes typed values (HUGEINT vs BIGINT mismatch even when the
    # stringified values agree), so the local compare must be
    # type-sensitive too.
    return [sorted(cols), [str(types[i]) for i in order], out]

def main(sf_dir, out_dir, sort_rows=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        rel = con.sql("SELECT * FROM read_parquet(" + repr(files) + ")")
        s_cols, s_types = rel.columns, rel.types
        s_rows = rel.fetchall()
        try:
            orel = con.sql(oracle[name])
            o_cols, o_types = orel.columns, orel.types
            o_rows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        sc, st, sr = norm_rows(s_cols, s_types, s_rows, sort_rows)
        oc, ot, orows = norm_rows(o_cols, o_types, o_rows, sort_rows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
        elif st != ot:
            print(f"FAIL {name}: column types {st} vs {ot}")
            n_fail += 1
        elif len(sr) != len(orows):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orows)}")
            n_fail += 1
        elif sr != orows:
            diffs = [(i, a, b) for i, (a, b) in
                     enumerate(zip(sr, orows)) if a != b][:3]
            print(f"FAIL {name}: value diff, first: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sort_rows="--sort" in sys.argv))
