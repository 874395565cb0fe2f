#!/usr/bin/env python3
"""Local pre-validation of the driver's t2 correctness gate.

Usage: tools/parity.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ (Spark parquet written by graft.Verify) and
<outDir>/oracle_sql.json, registers each fixture parquet as a DuckDB view
named after the table, runs the oracle SQL, and compares: column-name sets,
row counts, and values (columns sorted by name, exact equality; floats
compared exactly since both sides round identically per SURVEY §5.3).

Dev-side tooling only — the shipped Scala library does not depend on this.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)

def canon(v):
    # canonicalize a cell for comparison across duckdb/pyarrow
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    return v

def rows_of(table):
    cols = sorted(table.column_names)
    data = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    return [tuple(canon(data[c][i]) for c in cols) for i in range(n)], cols

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(os.listdir(outdir))
    n_pass = n_fail = 0
    for name in names:
        if name == "oracle_sql.json" or not os.path.isdir(os.path.join(outdir, name)):
            continue
        if only and name not in only:
            continue
        spark_tab = load_spark(outdir, name)
        if spark_tab is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracles:
            print(f"OK-NOORACLE {name}: rows={spark_tab.num_rows}")
            n_pass += 1
            continue
        try:
            duck_tab = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s_rows, s_cols = rows_of(spark_tab)
        d_rows, d_cols = rows_of(duck_tab)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                bad = (i, a, b); break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {s_cols}\n  spark: {a}\n  duck : {b}")
            n_fail += 1
            continue
        # type check (informational)
        s_types = {f.name: str(f.type) for f in spark_tab.schema}
        d_types = {f.name: str(f.type) for f in duck_tab.schema}
        tdiff = {c: (s_types[c], d_types[c]) for c in s_types
                 if s_types[c] != d_types.get(c)}
        note = f"  [type-diff {tdiff}]" if tdiff else ""
        print(f"PASS {name}: rows={len(s_rows)}{note}")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
