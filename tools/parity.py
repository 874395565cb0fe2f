#!/usr/bin/env python3
"""Local pre-validation of the driver's t2 correctness gate.

Usage: tools/parity.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ (Spark parquet written by graft.Verify) and
<outDir>/oracle_sql.json, registers each fixture parquet as a DuckDB view
named after the table, runs the oracle SQL, and compares the way the driver
does: load both sides into pandas, sort_values over ALL columns, then require
identical dtypes and exactly-equal values.  STRICT by construction:

  * any array/map/struct output column is an immediate FAIL (the driver's
    comparator crashes on unhashable ndarray/dict — round-1 lesson);
  * pandas dtypes must match (DuckDB HUGEINT -> object vs Spark int64 was a
    round-1 hash mismatch with identical values);
  * no float rounding — both engines already round identically via Det/floor,
    so any residual difference is a real bug.

Dev-side tooling only — the shipped Scala library does not depend on this.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

COMPLEX = (pa.lib.ListType, pa.lib.LargeListType, pa.lib.StructType,
           pa.lib.MapType, pa.lib.FixedSizeListType)

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def complex_cols(table):
    return [f.name for f in table.schema if isinstance(f.type, COMPLEX)]

def frame(table):
    """Mirror the driver: pandas, columns sorted by name, rows sorted by all
    columns. Raises (-> FAIL) on anything the driver would crash on."""
    df = table.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols).reset_index(drop=True), cols

def first_diff(a, b):
    for c in a.columns:
        neq = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = int(neq.idxmax())
            return c, i, a[c].iloc[i], b[c].iloc[i]
    return None

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
    # a query that crashed in Verify writes NO output dir — without this
    # check it would silently vanish from the report (round-2 lesson)
    for name in sorted(oracles):
        if name not in names and (not only or name in only):
            print(f"FAIL {name}: declared oracle but no spark output dir")
            n_fail += 1
    for name in names:
        if name == "oracle_sql.json" or not os.path.isdir(os.path.join(outdir, name)):
            continue
        if only and name not in only:
            continue
        spark_tab = load_spark(outdir, name)
        if spark_tab is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        cc = complex_cols(spark_tab)
        if cc:
            print(f"FAIL {name}: complex-typed output columns {cc} "
                  f"(driver comparator cannot hash these)")
            n_fail += 1; continue
        if name not in oracles:
            print(f"OK-NOORACLE {name}: rows={spark_tab.num_rows}")
            n_pass += 1
            continue
        try:
            duck_tab = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        try:
            s_df, s_cols = frame(spark_tab)
            d_df, d_cols = frame(duck_tab)
        except Exception as e:
            print(f"FAIL {name}: comparator crash (driver would too): {e}")
            n_fail += 1; continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if len(s_df) != len(d_df):
            print(f"FAIL {name}: rows spark={len(s_df)} duck={len(d_df)}"); n_fail += 1; continue
        def norm_dtype(d):
            # timestamp RESOLUTION (ns vs us) is invisible to the driver's
            # hash (CORRECTNESS_r01: all datetime queries green with mixed
            # resolutions); anything else — incl. int64 vs object(Decimal),
            # the round-1 q_text_stats failure — is a real hash difference
            s = str(d)
            return "datetime64" if s.startswith("datetime64") else s
        dt = {c: (str(s_df[c].dtype), str(d_df[c].dtype)) for c in s_cols
              if norm_dtype(s_df[c].dtype) != norm_dtype(d_df[c].dtype)}
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt} (hash would differ)")
            n_fail += 1; continue
        diff = first_diff(s_df, d_df)
        if diff:
            c, i, sv, dv = diff
            print(f"FAIL {name}: col {c} row {i}: spark={sv!r} duck={dv!r}")
            n_fail += 1; continue
        print(f"PASS {name}: rows={len(s_df)}")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
